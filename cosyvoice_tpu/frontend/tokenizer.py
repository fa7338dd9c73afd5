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

import os
import re
from typing import List, Optional

# exact paralinguistic special-token inventory (tokenizer.py:244-256)
V2_SPECIAL_TOKENS = [
    "<|im_start|>", "<|im_end|>", "<|endofprompt|>",
    "[breath]", "<strong>", "</strong>", "[noise]",
    "[laughter]", "[cough]", "[clucking]", "[accent]",
    "[quick_breath]",
    "<laughter>", "</laughter>",
    "[hissing]", "[sigh]", "[vocalized-noise]",
    "[lipsmack]", "[mn]",
]

# v3 pronunciation-inpainting inventory (tokenizer.py:274-306): CMU phones
# with stress digits + toned pinyin syllable pieces
_CMU = (
    "AA AA0 AA1 AA2 AE AE0 AE1 AE2 AH AH0 AH1 AH2 AO AO0 AO1 AO2 AW AW0 AW1 AW2 AY AY0 AY1 AY2 "
    "B CH D DH EH EH0 EH1 EH2 ER ER0 ER1 ER2 EY EY0 EY1 EY2 F G HH IH IH0 IH1 IH2 IY IY0 IY1 IY2 "
    "JH K L M N NG OW OW0 OW1 OW2 OY OY0 OY1 OY2 P R S SH T TH UH UH0 UH1 UH2 UW UW0 UW1 UW2 V W Y Z ZH"
).split()
_PINYIN = (
    "a ai an ang ao b c ch d e ei en eng f g h i ian in ing iu ià iàn iàng iào iá ián iáng iáo iè ié "
    "iòng ióng iù iú iā iān iāng iāo iē iě iōng iū iǎ iǎn iǎng iǎo iǒng iǔ j k l m n o ong ou p q r s sh "
    "t u uang ue un uo uà uài uàn uàng uá uái uán uáng uè ué uì uí uò uó uā uāi uān uāng uē uě uī uō uǎ "
    "uǎi uǎn uǎng uǐ uǒ vè w x y z zh à ài àn àng ào á ái án áng áo è èi èn èng èr é éi én éng ér ì ìn "
    "ìng í ín íng ò òng òu ó óng óu ù ùn ú ún ā āi ān āng āo ē ēi ēn ēng ě ěi ěn ěng ěr ī īn īng ō ōng "
    "ōu ū ūn ǎ ǎi ǎn ǎng ǎo ǐ ǐn ǐng ǒ ǒng ǒu ǔ ǔn ǘ ǚ ǜ"
).split()
V3_EXTRA_SPECIAL_TOKENS = ["<|endofsystem|>"] + [f"[{p}]" for p in _CMU] + [f"[{p}]" for p in _PINYIN]

# ---------------------------------------------------------------------------
# v1 whisper-style tokenizer constants (tokenizer.py:11-206): the tiktoken
# vocab asset "multilingual_zh_ja_yue_char_del.tiktoken" + this exact special
# inventory (order defines the ids, appended after the mergeable ranks)
# ---------------------------------------------------------------------------
_WHISPER_LANGS = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms cs ro da hu ta no th ur "
    "hr bg lt la mi ml cy sk te fa lv bn sr az sl kn et mk br eu is hy ne mn bs kk sq sw gl mr pa si "
    "km sn yo so af oc ka be tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln ha "
    "ba jw su yue minnan wuyu dialect zh/en en/zh"
).split()
_AUDIO_EVENTS = ["ASR", "AED", "SER", "Speech", "/Speech", "BGM", "/BGM",
                 "Laughter", "/Laughter", "Applause", "/Applause"]
_EMOTIONS = ["HAPPY", "SAD", "ANGRY", "NEUTRAL"]
_TTS_VOCAL = ["TTS/B", "TTS/O", "TTS/Q", "TTS/A", "TTS/CO", "TTS/CL", "TTS/H"] + [
    f"TTS/SP{i:02d}" for i in range(1, 14)
]

# tiktoken pre-tokenization pattern (tokenizer.py:204) — BPE merges never
# cross these piece boundaries
WHISPER_PAT_STR = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""


def whisper_v1_specials(num_languages: int = 99) -> List[str]:
    """Ordered special-token list of the v1 tokenizer (tokenizer.py:179-197)."""
    return [
        "<|endoftext|>",
        "<|startoftranscript|>",
        *[f"<|{lang}|>" for lang in _WHISPER_LANGS[:num_languages]],
        *[f"<|{e}|>" for e in _AUDIO_EVENTS],
        *[f"<|{e}|>" for e in _EMOTIONS],
        "<|translate|>",
        "<|transcribe|>",
        "<|startoflm|>",
        "<|startofprev|>",
        "<|nospeech|>",
        "<|notimestamps|>",
        *[f"<|SPECIAL_TOKEN_{i}|>" for i in range(1, 31)],
        *[f"<|{t}|>" for t in _TTS_VOCAL],
        *[f"<|{i * 0.02:.2f}|>" for i in range(1501)],
    ]


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


def find_tokenizer_assets(model_dir: Optional[str]) -> Optional[str]:
    """Locate tokenizer assets inside a released model dir.

    Probes, in order: a 'tokenizer/' subdir, the HF Qwen pretrain dir the
    released CosyVoice2/3 checkpoints ship ('CosyVoice-BlankEN', the yaml
    qwen_pretrain_path), the model dir itself, then a v1 *.tiktoken vocab
    (tokenizer/tokenizer.py:169-171 loads it from an assets/ dir)."""
    import glob

    if not model_dir:
        return None
    markers = ("tokenizer.json", "tokenizer_config.json", "vocab.json")
    for sub in ("tokenizer", "CosyVoice-BlankEN"):
        d = os.path.join(model_dir, sub)
        if any(os.path.exists(os.path.join(d, m)) for m in markers):
            return d
    if any(os.path.exists(os.path.join(model_dir, m)) for m in markers):
        return model_dir
    tk = sorted(glob.glob(os.path.join(model_dir, "*.tiktoken"))) + sorted(
        glob.glob(os.path.join(model_dir, "assets", "*.tiktoken"))
    )
    return tk[0] if tk else None


def get_tokenizer(token_path: Optional[str] = None, version: int = 2):
    special = V2_SPECIAL_TOKENS + (V3_EXTRA_SPECIAL_TOKENS if version >= 3 else [])
    if token_path and token_path.endswith(".tiktoken"):
        # v1 whisper-style tiktoken vocab -> native C++ BPE runtime with the
        # whisper pre-tokenization pattern and special inventory — token ids
        # match the reference's tiktoken.Encoding exactly
        # (tests/test_native_bpe.py::TestWhisperV1Parity)
        from cosyvoice_tpu.frontend.native_bpe import NativeBPETokenizer

        base = sum(1 for _ in open(token_path, "rb"))
        return NativeBPETokenizer(
            token_path,
            special_tokens={t: base + i for i, t in enumerate(whisper_v1_specials())},
            pat_str=WHISPER_PAT_STR,
        )
    if token_path:
        try:
            return QwenTokenizer(token_path, version=version)
        except Exception:
            import logging

            logging.exception(
                "failed to load Qwen tokenizer from %s — FALLING BACK to byte-level ids, "
                "which do NOT match a Qwen-trained LM's vocabulary", token_path,
            )
    return ByteFallbackTokenizer(special)
