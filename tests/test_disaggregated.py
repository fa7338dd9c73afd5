"""Disaggregated serving plane: LLM worker + token2wav worker + gateway
RemoteEngine, over real gRPC on localhost (tiny fakes stand in for the device
models; the cadence logic under test is the real engine generator)."""

import threading

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")


class FakeLM:
    """Emits a fixed token stream in blocks; records received requests."""

    def __init__(self, n_tokens=60, block=30):
        from cosyvoice_tpu.models.llm import LMConfig

        self.cfg = LMConfig()
        self.n_tokens = n_tokens
        self.block = block
        self.seen = []

    def generate(self, params, ids, types, rng, min_len, max_len):
        self.seen.append(("generate", np.asarray(ids).copy(), int(min_len), int(max_len)))
        toks = np.arange(self.n_tokens, dtype=np.int32) % 100
        for i in range(0, self.n_tokens, self.block):
            yield toks[i : i + self.block]

    def generate_bistream(self, params, text_stream, prompt_text, prompt_speech, rng):
        chunks = [np.asarray(c) for c in text_stream]
        self.seen.append(("bistream", [len(c) for c in chunks], list(prompt_text), list(prompt_speech)))
        for c in chunks:
            yield (np.arange(5, dtype=np.int32) + len(c))


class FakeT2WEngine:
    """Returns wav sized by the number of NEW tokens; records calls."""

    wav_per_token = 960  # token_mel_ratio * hop

    def __init__(self):
        self.calls = []

    def token2wav(self, state, tokens, prompt_token, prompt_feat, embedding,
                  token_offset, stream=False, finalize=False, speed=1.0):
        la = 0 if finalize else 3
        n_new = len(tokens) - la - token_offset
        self.calls.append(("stream", len(tokens), int(token_offset), bool(finalize),
                           prompt_feat.shape, embedding.shape))
        return np.full((1, max(n_new, 0) * self.wav_per_token), 0.25, np.float32)

    def synthesize_offline(self, tokens, prompt_token, prompt_feat, embedding, speed=1.0):
        self.calls.append(("offline", len(tokens), prompt_feat.shape, float(speed)))
        return np.full((1, len(tokens) * self.wav_per_token), 0.5, np.float32)


@pytest.fixture(scope="module")
def workers():
    from cosyvoice_tpu.serving.disaggregated import make_llm_server, make_t2w_server

    lm = FakeLM()
    eng = FakeT2WEngine()
    llm_srv, _ = make_llm_server(lm, None, port=50921, max_batch=1)
    t2w_srv, _ = make_t2w_server(eng, port=50922)
    llm_srv.start()
    t2w_srv.start()
    yield lm, eng
    llm_srv.stop(0)
    t2w_srv.stop(0)


@pytest.fixture()
def remote_engine(workers):
    from cosyvoice_tpu.serving.disaggregated import RemoteEngine

    return RemoteEngine(
        grpc.insecure_channel("127.0.0.1:50921"),
        grpc.insecure_channel("127.0.0.1:50922"),
    )


def _tts_kwargs(stream):
    return dict(
        text_tokens=np.arange(10, dtype=np.int32),
        prompt_text_tokens=np.asarray([7, 8], np.int32),
        llm_prompt_speech_token=np.asarray([1, 2, 3], np.int32),
        flow_prompt_speech_token=np.asarray([1, 2, 3, 4], np.int32),
        prompt_speech_feat=np.zeros((1, 8, 80), np.float32),
        flow_embedding=np.ones((1, 192), np.float32),
        stream=stream,
    )


class TestDisaggregated:
    def test_offline(self, workers, remote_engine):
        lm, eng = workers
        outs = list(remote_engine.tts(**_tts_kwargs(stream=False)))
        assert len(outs) == 1
        # 60 tokens produced -> offline synth of all of them
        assert outs[0]["tts_speech"].shape[1] == 60 * FakeT2WEngine.wav_per_token
        kind, ids, min_len, max_len = lm.seen[-1]
        assert kind == "generate" and min_len == 20 and max_len == 200
        # prompt layout [sos, prompt_text(2), text(10), task, prompt_speech(3)]
        assert len(ids) == 1 + 2 + 10 + 1 + 3
        assert eng.calls[-1][0] == "offline"

    def test_streaming_cadence(self, workers, remote_engine):
        lm, eng = workers
        eng.calls.clear()
        outs = list(remote_engine.tts(**_tts_kwargs(stream=True)))
        # prompt_pad = 25 - 4 = 21 -> first hop 46 (+3 lookahead), then done
        kinds = [c[0] for c in eng.calls]
        assert kinds == ["stream", "stream"]
        assert eng.calls[0][2] == 0 and eng.calls[0][3] is False
        assert eng.calls[1][3] is True  # finalize
        assert eng.calls[0][1] == 49  # 46 + lookahead 3
        total = sum(o["tts_speech"].shape[1] for o in outs)
        assert total == 60 * FakeT2WEngine.wav_per_token

    def test_interleaved_streams_cleanup(self, workers, remote_engine):
        """Two tts() generators interleaved, every next() on a DIFFERENT
        thread (the FastAPI iterate_in_threadpool dispatch pattern): each
        session must produce its full audio and close exactly its own
        token2wav stream — no leaks, no cross-session closes."""
        g1 = remote_engine.tts(**_tts_kwargs(stream=True))
        g2 = remote_engine.tts(**_tts_kwargs(stream=True))

        def step(gen):
            box = {}

            def run():
                try:
                    box["v"] = next(gen)
                except StopIteration:
                    box["v"] = None

            t = threading.Thread(target=run)
            t.start()
            t.join()
            return box["v"]

        outs1, outs2 = [], []
        while True:
            v1, v2 = step(g1), step(g2)
            if v1 is None and v2 is None:
                break
            if v1 is not None:
                outs1.append(v1)
            if v2 is not None:
                outs2.append(v2)
        total = 60 * FakeT2WEngine.wav_per_token
        assert sum(o["tts_speech"].shape[1] for o in outs1) == total
        assert sum(o["tts_speech"].shape[1] for o in outs2) == total
        assert remote_engine._streams == {}, "leaked token2wav streams"

    def test_bistream_text_input(self, workers, remote_engine):
        lm, eng = workers

        def text_gen():
            yield np.asarray([1, 2, 3], np.int32)
            yield np.asarray([4, 5], np.int32)

        kw = _tts_kwargs(stream=False)
        kw["text_tokens"] = text_gen()
        outs = list(remote_engine.tts(**kw))
        assert len(outs) == 1
        kind, chunk_lens, ptext, pspeech = lm.seen[-1]
        assert kind == "bistream" and chunk_lens == [3, 2]
        assert ptext == [7, 8] and pspeech == [1, 2, 3]
        # two bistream blocks of 5 tokens each
        assert outs[0]["tts_speech"].shape[1] == 10 * FakeT2WEngine.wav_per_token
