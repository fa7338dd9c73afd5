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
