"""Weighted-prompt parsing and embedding.

Capability parity with the reference's Compel usage
(reference: modules/controlanimate_pipeline.py:4,133-135; prompts like
"(female villain)+, (perfect face)++, (muscle body)0.2" in
configs/prompts/SampleConfig.yaml). The parser accepts the Compel attention
syntax: `word+`, `word++`, `word-`, `(multi word)+`, `(fragment)1.3`,
nesting. Weights are 1.1^n for +/-, or the explicit float.

Beyond the attention syntax the reference's shipped configs use, the
Compel CONJUNCTION operators are supported at the top level:
  ("prompt a", "prompt b").blend(0.6, 0.4) — weighted sum of the two
      encoded prompts (weights normalized to 1);
  ("prompt a", "prompt b").and()          — per-prompt embeddings
      concatenated on the token axis (optionally weighted: .and(0.7, 0.3)).
Sub-prompts may themselves use attention weighting. Mixed-length CFG pairs
are padded by the caller (facade `_encode_prompts`).

Embedding strategy: per-token weight scaling with mean-norm restoration
(encode the full prompt once, scale each token's embedding by its weight,
then rescale so the overall embedding norm matches the unweighted one).
The parser is pure Python (host); the weighting math is JAX.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
import jax.numpy as jnp
import numpy as np

STEP = 1.1  # Compel's per-+/- attention factor


@dataclass
class Fragment:
    text: str
    weight: float


def parse_weighted_prompt(prompt: str) -> list[Fragment]:
    """Parse Compel attention syntax into (text, weight) fragments."""
    frags: list[Fragment] = []

    def emit(text: str, weight: float):
        text = text.strip()
        if text:
            frags.append(Fragment(text, weight))

    i, n = 0, len(prompt)
    buf = ""
    while i < n:
        c = prompt[i]
        if c == "(":
            emit(buf, 1.0)
            buf = ""
            depth = 1
            j = i + 1
            while j < n and depth:
                if prompt[j] == "(":
                    depth += 1
                elif prompt[j] == ")":
                    depth -= 1
                j += 1
            inner = prompt[i + 1 : j - 1]
            # suffix: +/-/float
            m = re.match(r"(\+{1,10}|-{1,10}|\d+(?:\.\d+)?|\.\d+)", prompt[j:])
            weight = 1.0
            if m:
                s = m.group(0)
                if s.startswith("+"):
                    weight = STEP ** len(s)
                elif s.startswith("-"):
                    weight = STEP ** -len(s)
                else:
                    weight = float(s)
                j += len(s)
            # nested fragments multiply
            for sub in parse_weighted_prompt(inner):
                frags.append(Fragment(sub.text, sub.weight * weight))
            i = j
        elif c in "+-" and buf.rstrip() and not buf.rstrip().endswith(","):
            # word-suffix weights: collect the run of +/-
            j = i
            while j < n and prompt[j] == c:
                j += 1
            run = j - i
            # apply to the last word in buf
            stripped = buf.rstrip()
            k = max(stripped.rfind(" "), stripped.rfind(","))
            head, word = stripped[: k + 1], stripped[k + 1 :]
            emit(head, 1.0)
            emit(word, STEP**run if c == "+" else STEP**-run)
            buf = ""
            i = j
        else:
            buf += c
            i += 1
    emit(buf, 1.0)
    return frags


# top-level Compel conjunction: ("a", "b").and(...) / .blend(...)
_CONJ_RE = re.compile(
    r'^\s*\(\s*("[^"]*"(?:\s*,\s*"[^"]*")*)\s*\)\s*\.\s*(and|blend)\s*'
    r"\(([^)]*)\)\s*$",
    re.S,
)


def parse_conjunction(prompt: str):
    """Return (op, [subprompts], [weights]) for a top-level conjunction, or
    None when the prompt is a plain (attention-weighted) prompt."""
    m = _CONJ_RE.match(prompt or "")
    if not m:
        return None
    parts = re.findall(r'"([^"]*)"', m.group(1))
    op = m.group(2)
    args = [float(x) for x in m.group(3).split(",") if x.strip()]
    if not args:
        args = [1.0] * len(parts)
    if len(args) != len(parts):
        raise ValueError(
            f"conjunction has {len(parts)} prompts but {len(args)} weights"
        )
    return op, parts, args


def encode_weighted_prompt(
    tokenizer,
    encode_fn,
    prompt: str,
    max_length: int = 77,
):
    """Tokenize fragments, build per-token weights, encode, apply weighting.

    encode_fn: (ids (1, L) int32) -> (1, L, D) embeddings (the CLIP tower,
    including clip-skip handling).
    Returns (1, L, D) weighted embeddings (L = k*max_length for a k-way
    `.and()` conjunction).
    """
    conj = parse_conjunction(prompt)
    if conj is not None:
        op, parts, args = conj
        embs = [
            encode_weighted_prompt(tokenizer, encode_fn, p, max_length)
            for p in parts
        ]
        if op == "blend":
            w = np.asarray(args, np.float32)
            w = w / max(float(w.sum()), 1e-8)
            out = sum(float(wi) * e for wi, e in zip(w, embs))
            return out
        # .and(): weighted concatenation on the token axis
        return jnp.concatenate(
            [e * float(wi) for e, wi in zip(embs, args)], axis=1
        )

    frags = parse_weighted_prompt(prompt)
    ids: list[int] = []
    weights: list[float] = []
    for f in frags:
        t = tokenizer.tokenize_to_ids(f.text)
        ids.extend(t)
        weights.extend([f.weight] * len(t))
    ids = ids[: max_length - 2]
    weights = weights[: max_length - 2]

    row = [tokenizer.bos_token_id] + ids + [tokenizer.eos_token_id]
    wrow = [1.0] + weights + [1.0]
    pad = max_length - len(row)
    row = row + [tokenizer.pad_token_id] * pad
    wrow = wrow + [1.0] * pad

    ids_arr = jnp.asarray(np.asarray(row, np.int32)[None])
    w_arr = jnp.asarray(np.asarray(wrow, np.float32)[None, :, None])

    emb = encode_fn(ids_arr)  # (1, L, D)
    if all(abs(w - 1.0) < 1e-6 for w in wrow):
        return emb
    prev_mean = jnp.abs(emb).mean()
    weighted = emb * w_arr
    new_mean = jnp.abs(weighted).mean()
    return weighted * (prev_mean / jnp.maximum(new_mean, 1e-8))
