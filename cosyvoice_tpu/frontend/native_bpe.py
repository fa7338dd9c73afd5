"""ctypes bindings for the native C++ BPE tokenizer (csrc/bpe_tokenizer.cc).

Drop-in for the reference's Rust tiktoken runtime (tokenizer.py:9,200-206):
loads tiktoken-format vocab files (base64 token + rank per line), encodes
UTF-8 bytes by greedy lowest-rank pair merging. Special tokens are segmented
in Python (longest match) and passed through by id.

The shared library is built on first use with g++ -O3 and cached next to the
source; set COSY_BPE_NO_BUILD=1 to disable auto-build.
"""

import ctypes
import os
import re
import subprocess
from typing import Dict, List, Optional

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_SRC, "libbpe_tokenizer.so")


def _build_lib() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(os.path.join(_SRC, "bpe_tokenizer.cc")):
        return _SO
    if os.environ.get("COSY_BPE_NO_BUILD"):
        raise RuntimeError("native bpe lib missing and COSY_BPE_NO_BUILD set")
    # atomic: build to a pid-unique temp then rename (concurrent first-use
    # builds must never CDLL a partially written .so)
    tmp = f"{_SO}.{os.getpid()}.tmp"
    subprocess.check_call(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", os.path.join(_SRC, "bpe_tokenizer.cc"), "-o", tmp]
    )
    os.replace(tmp, _SO)
    return _SO


class NativeBPETokenizer:
    def __init__(
        self,
        vocab_path: str,
        special_tokens: Optional[Dict[str, int]] = None,
        pat_str: Optional[str] = None,
    ):
        """pat_str: optional tiktoken pre-tokenization regex (\\p classes ok —
        compiled with the `regex` module). BPE merges then never cross piece
        boundaries, matching tiktoken.Encoding exactly; without it the core
        merges over the whole span (fine for vocabularies whose merges never
        span piece boundaries, NOT exact for GPT-style vocabs)."""
        lib = ctypes.CDLL(_build_lib())
        lib.bpe_load.restype = ctypes.c_void_p
        lib.bpe_load.argtypes = [ctypes.c_char_p]
        lib.bpe_encode.restype = ctypes.c_int
        lib.bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.bpe_decode.restype = ctypes.c_int
        lib.bpe_decode.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                                   ctypes.c_char_p, ctypes.c_int]
        lib.bpe_vocab_size.restype = ctypes.c_int
        lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.bpe_load(vocab_path.encode())
        if not self._h:
            raise FileNotFoundError(vocab_path)
        self.special_tokens = dict(special_tokens or {})
        self._special_re = (
            re.compile("|".join(re.escape(t) for t in sorted(self.special_tokens, key=len, reverse=True)))
            if self.special_tokens
            else None
        )
        self._pat = None
        if pat_str is not None:
            import regex  # supports \p{L}/\p{N} like tiktoken's rust regex

            self._pat = regex.compile(pat_str)

    @property
    def vocab_size(self) -> int:
        return self._lib.bpe_vocab_size(self._h) + len(self.special_tokens)

    def _encode_piece(self, raw: bytes) -> List[int]:
        if not raw:
            return []
        cap = len(raw) + 8
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.bpe_encode(self._h, raw, len(raw), buf, cap)
        if n < 0:
            raise ValueError("bpe encode failed (byte missing from vocab?)")
        return list(buf[:n])

    def _encode_span(self, text: str) -> List[int]:
        if self._pat is None:
            return self._encode_piece(text.encode("utf-8"))
        out: List[int] = []
        for piece in self._pat.findall(text):
            out.extend(self._encode_piece(piece.encode("utf-8")))
        return out

    def encode(self, text: str, allowed_special: str = "all") -> List[int]:
        if self._special_re is None:
            return self._encode_span(text)
        out: List[int] = []
        pos = 0
        for m in self._special_re.finditer(text):
            out.extend(self._encode_span(text[pos : m.start()]))
            out.append(self.special_tokens[m.group(0)])
            pos = m.end()
        out.extend(self._encode_span(text[pos:]))
        return out

    def decode(self, ids: List[int]) -> str:
        rev = {v: k for k, v in self.special_tokens.items()}
        out, span = [], []

        def flush():
            if not span:
                return
            arr = (ctypes.c_int32 * len(span))(*span)
            # GPT-2-style vocabs contain single tokens far longer than 8
            # bytes (e.g. 64-dash runs); grow the buffer until it fits
            cap = 8 * len(span) + 16
            for _ in range(8):
                buf = ctypes.create_string_buffer(cap)
                n = self._lib.bpe_decode(self._h, arr, len(span), buf, cap)
                if n >= 0:
                    break
                cap *= 4
            if n < 0:
                raise ValueError("bpe decode failed")
            out.append(buf.raw[:n].decode("utf-8", errors="replace"))
            span.clear()

        for i in ids:
            if i in rev:
                flush()
                out.append(rev[i])
            else:
                span.append(i)
        flush()
        return "".join(out)
