import base64

import pytest

from cosyvoice_tpu.frontend.native_bpe import NativeBPETokenizer


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    """Tiny byte-level BPE vocab: 256 byte tokens + merges for 'he', 'll',
    'hell', 'hello' with ranks reflecting merge priority."""
    path = tmp_path_factory.mktemp("bpe") / "vocab.tiktoken"
    lines = []
    for b in range(256):
        lines.append(f"{base64.b64encode(bytes([b])).decode()} {b}")
    merges = {b"he": 256, b"ll": 257, b"hell": 258, b"hello": 259, b"lo": 260}
    for tok, rank in merges.items():
        lines.append(f"{base64.b64encode(tok).decode()} {rank}")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


class TestNativeBPE:
    def test_greedy_merges(self, vocab_file):
        tok = NativeBPETokenizer(vocab_file)
        assert tok.encode("hello") == [259]
        assert tok.encode("hell") == [258]
        # 'helo' -> he(256) + l + o ... then lo merges (rank 260 > nothing else)
        assert tok.encode("helo") == [256, 260]

    def test_roundtrip(self, vocab_file):
        tok = NativeBPETokenizer(vocab_file)
        for text in ("hello world", "abc", "héllo"):
            assert tok.decode(tok.encode(text)) == text

    def test_special_tokens(self, vocab_file):
        tok = NativeBPETokenizer(vocab_file, special_tokens={"<|endofprompt|>": 1000})
        ids = tok.encode("hello<|endofprompt|>hello")
        assert ids == [259, 1000, 259]
        assert tok.decode(ids) == "hello<|endofprompt|>hello"

    def test_vocab_size(self, vocab_file):
        tok = NativeBPETokenizer(vocab_file, special_tokens={"<|x|>": 999})
        assert tok.vocab_size == 261 + 1


_V1_ASSET = "/root/reference/cosyvoice/tokenizer/assets/multilingual_zh_ja_yue_char_del.tiktoken"


@pytest.mark.skipif(not __import__("os").path.exists(_V1_ASSET), reason="v1 vocab asset not mounted")
class TestWhisperV1Parity:
    """Token-id parity of the native C++ BPE + whisper pre-tokenizer against a
    real tiktoken.Encoding built EXACTLY as the reference builds it
    (tokenizer/tokenizer.py:169-206) over the released v1 vocab asset."""

    @pytest.fixture(scope="class")
    def pair(self):
        tiktoken = pytest.importorskip("tiktoken")
        from cosyvoice_tpu.frontend.tokenizer import get_tokenizer, whisper_v1_specials, WHISPER_PAT_STR

        ranks = {
            base64.b64decode(token): int(rank)
            for token, rank in (line.split() for line in open(_V1_ASSET) if line)
        }
        n_vocab = len(ranks)
        specials = whisper_v1_specials()
        enc = tiktoken.Encoding(
            name="v1",
            explicit_n_vocab=n_vocab + len(specials),
            pat_str=WHISPER_PAT_STR,
            mergeable_ranks=ranks,
            special_tokens={t: n_vocab + i for i, t in enumerate(specials)},
        )
        ours = get_tokenizer(_V1_ASSET, version=1)
        return enc, ours

    SAMPLES = [
        "Hello, world! It's 2024.",
        "你好，世界。今天天气不错，想出去走走。",
        "日本語のテストです。こんにちは!",
        "mixed 中英文 mixed text with   spaces\nand newlines",
        "numbers 12345 and punctuation?!<>#$%",
        "粤语测试：今日好開心。",
    ]

    def test_encode_parity(self, pair):
        enc, ours = pair
        for s in self.SAMPLES:
            assert ours.encode(s) == enc.encode(s), f"mismatch on {s!r}"

    def test_special_token_parity(self, pair):
        enc, ours = pair
        s = "<|startoftranscript|><|zh|>你好<|endoftext|>"
        assert ours.encode(s) == enc.encode(s, allowed_special="all")

    def test_decode_roundtrip(self, pair):
        enc, ours = pair
        for s in self.SAMPLES:
            assert ours.decode(ours.encode(s)) == s

    def test_vocab_size_matches_v1_lm_head(self, pair):
        """text_token_size in the v1 yaml is 51866 = ranks + specials."""
        enc, ours = pair
        assert ours.vocab_size == enc.n_vocab
