"""Self-contained CLIP BPE tokenizer.

The reference loads `CLIPTokenizer.from_pretrained` from the SD snapshot
(reference: modules/controlanimate_pipeline.py:34). This implementation reads
the same `tokenizer/vocab.json` + `tokenizer/merges.txt` files directly — no
hub access, no torch — and adds first-class multi-vector textual-inversion
tokens (the reference grafts these through diffusers'
TextualInversionLoaderMixin + maybe_convert_prompt,
modules/controlanimate_pipeline.py:118-121).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Iterable, Optional

try:  # transformers ships `regex`; fall back to stdlib re with an ASCII-ish pattern
    import regex as _re

    _PAT = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        _re.IGNORECASE,
    )
except ImportError:  # pragma: no cover
    import re as _re

    _PAT = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+""",
        _re.IGNORECASE,
    )


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 reversible byte↔unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word[:-1], word[1:]))


def _whitespace_clean(text: str) -> str:
    return " ".join(text.split()).strip()


class CLIPTokenizer:
    """Byte-level BPE with CLIP's `</w>` word-boundary convention."""

    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        model_max_length: int = 77,
        bos_token: str = "<|startoftext|>",
        eos_token: str = "<|endoftext|>",
    ):
        self.vocab = dict(vocab)
        self.decoder = {v: k for k, v in self.vocab.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.model_max_length = model_max_length
        self.bos_token_id = self.vocab[bos_token]
        self.eos_token_id = self.vocab[eos_token]
        self.pad_token_id = self.eos_token_id  # SD1.5 pads with <|endoftext|>
        self._cache: dict[str, str] = {}
        # textual-inversion: placeholder token -> list of embedding ids
        # (ids index rows appended after the base vocab embedding table)
        self.added_multi_tokens: dict[str, list[int]] = {}
        self.num_added_embeddings = 0

    # -- construction --------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str | Path) -> "CLIPTokenizer":
        """Load from an SD-snapshot `tokenizer/` dir (vocab.json + merges.txt)."""
        path = Path(path)
        if (path / "tokenizer").is_dir():
            path = path / "tokenizer"
        vocab = json.loads((path / "vocab.json").read_text(encoding="utf-8"))
        merge_lines = (path / "merges.txt").read_text(encoding="utf-8").split("\n")
        if merge_lines and merge_lines[0].startswith("#"):
            merge_lines = merge_lines[1:]
        merges = [tuple(l.split()) for l in merge_lines if len(l.split()) == 2]
        return cls(vocab, merges)

    @classmethod
    def tiny(cls, corpus: Iterable[str] = ()) -> "CLIPTokenizer":
        """Build a minimal character-level tokenizer for tests (no merges)."""
        byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
        vocab = dict(byte_vocab)
        for c in list(byte_vocab):
            vocab[c + "</w>"] = len(vocab)
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        return cls(vocab, [])

    # -- textual inversion ---------------------------------------------------
    def add_multi_vector_token(self, placeholder: str, num_vectors: int) -> list[int]:
        """Register a TI placeholder expanding to `num_vectors` embedding rows
        (capability of reference maybe_convert_prompt + load_textual_inversion)."""
        ids = list(range(self.num_added_embeddings, self.num_added_embeddings + num_vectors))
        self.added_multi_tokens[placeholder.lower()] = ids
        self.num_added_embeddings += num_vectors
        return ids

    # -- BPE -----------------------------------------------------------------
    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def tokenize_to_ids(self, text: str) -> list[int]:
        """Raw token ids (no special tokens). TI placeholders expand to their
        extended-embedding ids offset by len(vocab)."""
        text = _whitespace_clean(text).lower()
        ids: list[int] = []
        for token in _PAT.findall(text):
            if token in self.added_multi_tokens:
                ids.extend(len(self.vocab) + i for i in self.added_multi_tokens[token])
                continue
            token_bytes = token.encode("utf-8")
            mapped = "".join(self.byte_encoder[b] for b in token_bytes)
            for bpe_token in self.bpe(mapped).split(" "):
                tid = self.vocab.get(bpe_token)
                if tid is None:
                    tid = self.vocab.get(bpe_token.replace("</w>", ""), self.eos_token_id)
                ids.append(tid)
        return ids

    def __call__(
        self,
        text: str | list[str],
        padding: str = "max_length",
        truncation: bool = True,
        max_length: Optional[int] = None,
    ):
        """Encode to fixed-length id arrays (numpy), CLIP convention:
        [bos] tokens [eos] + eos-padding to 77."""
        import numpy as np

        if isinstance(text, str):
            text = [text]
        max_len = max_length or self.model_max_length
        rows = []
        for t in text:
            ids = self.tokenize_to_ids(t)
            if truncation:
                ids = ids[: max_len - 2]
            row = [self.bos_token_id] + ids + [self.eos_token_id]
            row = row + [self.pad_token_id] * (max_len - len(row))
            rows.append(row)
        return np.asarray(rows, dtype=np.int32)

    def decode(self, ids: Iterable[int]) -> str:
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        text = "".join(
            self.decoder.get(int(i), "") for i in ids if int(i) < len(self.decoder)
        )
        text = text.replace("</w>", " ")
        raw = bytearray(byte_decoder.get(c, ord(" ")) for c in text if c in byte_decoder)
        return raw.decode("utf-8", errors="replace").strip()
