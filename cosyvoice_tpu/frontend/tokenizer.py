"""Text tokenizers.

The reference uses the Qwen2 HF tokenizer with ~19 paralinguistic special
tokens for CosyVoice2 (cosyvoice/tokenizer/tokenizer.py:241-271) and adds
`<|endofsystem|>` plus a full CMU-phoneme / pinyin inventory for CosyVoice3
(:274-313). Here:

- `QwenTokenizer` wraps a local HF tokenizer directory when available
  (transformers is baked in; the vocab ships with the model dir), adding the
  same special-token lists.
- `ByteFallbackTokenizer` is a deterministic dependency-free stand-in
  (UTF-8 bytes + special-token pass-through) used by tests/bench and when no
  tokenizer assets are present.
"""

import re
from typing import List, Optional

V2_SPECIAL_TOKENS = [
    "<|endofprompt|>",
    "[breath]", "<strong>", "</strong>", "[noise]", "[laughter]", "[cough]", "[clucking]",
    "[accent]", "[quick_breath]", "<laughter>", "</laughter>", "[hissing]", "[sigh]",
    "[vocalized-noise]", "[lipsmack]", "[mn]",
]

_PINYIN_INITIALS = "b p m f d t n l g k h j q x zh ch sh r z c s y w".split()
_CMU_PHONES = (
    "AA AE AH AO AW AY B CH D DH EH ER EY F G HH IH IY JH K L M N NG OW OY P R S SH T TH UH UW V W Y Z ZH"
).split()
V3_EXTRA_SPECIAL_TOKENS = (
    ["<|endofsystem|>"]
    + [f"<|{p}|>" for p in _CMU_PHONES]
    + [f"<|{i}{v}{t}|>" for i in ["a", "o", "e", "i", "u", "v"] for v in [""] for t in ["1", "2", "3", "4", "5"]]
)


class ByteFallbackTokenizer:
    """UTF-8 byte tokenizer with special-token pass-through.

    ids: 0..255 raw bytes; specials appended after byte range. Deterministic,
    reversible, and dependency-free — a functional stand-in until real Qwen
    vocab assets are mounted.
    """

    def __init__(self, special_tokens: Optional[List[str]] = None):
        self.special_tokens = list(special_tokens or V2_SPECIAL_TOKENS)
        self.special_ids = {t: 256 + i for i, t in enumerate(self.special_tokens)}
        self._pattern = re.compile("|".join(re.escape(t) for t in self.special_tokens)) if self.special_tokens else None

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.special_tokens)

    def encode(self, text: str, allowed_special: str = "all") -> List[int]:
        ids: List[int] = []
        pos = 0
        for m in self._pattern.finditer(text) if self._pattern else []:
            ids.extend(text[pos : m.start()].encode("utf-8"))
            ids.append(self.special_ids[m.group(0)])
            pos = m.end()
        ids.extend(text[pos:].encode("utf-8"))
        return ids

    def decode(self, ids: List[int]) -> str:
        out, buf = [], []
        rev = {v: k for k, v in self.special_ids.items()}
        for i in ids:
            if i < 256:
                buf.append(i)
            else:
                if buf:
                    out.append(bytes(buf).decode("utf-8", errors="replace"))
                    buf = []
                out.append(rev.get(i, ""))
        if buf:
            out.append(bytes(buf).decode("utf-8", errors="replace"))
        return "".join(out)


class QwenTokenizer:
    """HF Qwen2 tokenizer + CosyVoice special tokens (tokenizer.py:241-327)."""

    def __init__(self, token_path: str, skip_special_tokens: bool = True, version: int = 2):
        from transformers import AutoTokenizer

        special = V2_SPECIAL_TOKENS + (V3_EXTRA_SPECIAL_TOKENS if version >= 3 else [])
        self.tokenizer = AutoTokenizer.from_pretrained(token_path)
        self.tokenizer.add_special_tokens({"additional_special_tokens": special})
        self.skip_special_tokens = skip_special_tokens

    @property
    def vocab_size(self) -> int:
        return len(self.tokenizer)

    def encode(self, text: str, allowed_special: str = "all") -> List[int]:
        return self.tokenizer.encode(text, add_special_tokens=False)

    def decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=self.skip_special_tokens)


def get_tokenizer(token_path: Optional[str] = None, version: int = 2):
    special = V2_SPECIAL_TOKENS + (V3_EXTRA_SPECIAL_TOKENS if version >= 3 else [])
    if token_path and token_path.endswith(".tiktoken"):
        # v1 whisper-style tiktoken vocab -> native C++ BPE runtime
        from cosyvoice_tpu.frontend.native_bpe import NativeBPETokenizer

        base = sum(1 for _ in open(token_path, "rb"))
        return NativeBPETokenizer(token_path, special_tokens={t: base + i for i, t in enumerate(special)})
    if token_path:
        try:
            return QwenTokenizer(token_path, version=version)
        except Exception:
            pass
    return ByteFallbackTokenizer(special)
