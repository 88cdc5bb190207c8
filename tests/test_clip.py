"""Golden tests: Flax CLIP towers vs transformers' torch CLIP with identical
(random, tiny) weights — the strongest available oracle with no model zoo."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from controlanimate_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
)
from controlanimate_tpu.weights.clip_weights import (
    text_params_from_torch,
    vision_params_from_torch,
)


def test_text_encoder_matches_torch():
    tcfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=77,
        eos_token_id=999,
        bos_token_id=998,
    )
    torch.manual_seed(0)
    tmodel = transformers.CLIPTextModel(tcfg).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, eos_token_id=999,
    )
    fmodel = CLIPTextModel(cfg)
    params = text_params_from_torch(sd, cfg.num_layers)

    ids = np.random.RandomState(0).randint(0, 998, size=(2, 77)).astype(np.int32)
    ids[:, -1] = 999  # eos
    with torch.no_grad():
        tout = tmodel(input_ids=torch.from_numpy(ids.astype(np.int64)))
    fout = fmodel.apply({"params": params}, jnp.asarray(ids))

    np.testing.assert_allclose(
        np.asarray(fout["last_hidden_state"]),
        tout.last_hidden_state.numpy(),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fout["pooled_output"]), tout.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def test_text_encoder_clip_skip_changes_output():
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=3, num_heads=2,
                         intermediate_size=64, eos_token_id=99)
    model = CLIPTextModel(cfg)
    import jax
    ids = jnp.zeros((1, 77), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    out0 = model.apply({"params": params}, ids, clip_skip=0)
    out1 = model.apply({"params": params}, ids, clip_skip=1)
    assert not np.allclose(
        np.asarray(out0["encoder_hidden_states"]), np.asarray(out1["encoder_hidden_states"])
    )


def test_vision_encoder_matches_torch():
    tcfg = transformers.CLIPVisionConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        projection_dim=48,
    )
    torch.manual_seed(0)
    tmodel = transformers.CLIPVisionModelWithProjection(tcfg).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    cfg = CLIPVisionConfig(
        hidden_size=64, num_layers=3, num_heads=4, intermediate_size=128,
        image_size=32, patch_size=8, projection_dim=48,
    )
    fmodel = CLIPVisionModelWithProjection(cfg)
    params = vision_params_from_torch(sd, cfg.num_layers)

    px = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(pixel_values=torch.from_numpy(np.transpose(px, (0, 3, 1, 2))))
    fout = fmodel.apply({"params": params}, jnp.asarray(px))
    np.testing.assert_allclose(
        np.asarray(fout["image_embeds"]), tout.image_embeds.numpy(), atol=3e-5, rtol=1e-4
    )


def test_tokenizer_roundtrip_and_ti():
    from controlanimate_tpu.models.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer.tiny()
    ids = tok("hello world")
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos_token_id
    # eos appears right after the content
    content_len = len(tok.tokenize_to_ids("hello world"))
    assert ids[0, content_len + 1] == tok.eos_token_id
    # multi-vector TI expands to several extended ids
    tok.add_multi_vector_token("easynegative", 4)
    ids2 = tok.tokenize_to_ids("easynegative")
    assert len(ids2) == 4
    assert all(i >= len(tok.vocab) for i in ids2)


def test_tokenizer_matches_transformers_when_vocab_available():
    """If a real SD snapshot tokenizer is ever present locally, compare 1:1."""
    from pathlib import Path
    snap = Path("/root/reference/models/StableDiffusion/stable-diffusion-v1-5/tokenizer")
    if not snap.exists():
        pytest.skip("no local SD tokenizer files")
