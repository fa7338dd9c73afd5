import base64
import http.client
import json
import threading
import time

import numpy as np
import pytest


class FakeModel:
    """Serving plumbing test double: yields two fixed chunks per request."""

    sample_rate = 24000

    def _gen(self):
        yield {"tts_speech": np.full((1, 1000), 0.1, np.float32)}
        yield {"tts_speech": np.full((1, 500), -0.1, np.float32)}

    def inference_zero_shot(self, tts_text, prompt_text, prompt_wav, **kw):
        assert isinstance(tts_text, str)
        return self._gen()

    def inference_cross_lingual(self, tts_text, prompt_wav, **kw):
        return self._gen()

    def inference_sft(self, tts_text, spk_id, **kw):
        return self._gen()

    def inference_instruct(self, tts_text, spk_id, instruct_text, **kw):
        return self._gen()

    def inference_instruct2(self, tts_text, instruct_text, prompt_wav, **kw):
        return self._gen()


@pytest.fixture(scope="module")
def http_srv():
    from cosyvoice_tpu.serving.http_server import make_stdlib_server

    srv = make_stdlib_server(FakeModel(), host="127.0.0.1", port=50911)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def grpc_srv():
    from cosyvoice_tpu.serving.grpc_server import make_server

    srv = make_server(FakeModel(), port=50912)
    srv.start()
    yield srv
    srv.stop(0)


class TestHTTPServing:
    def test_zero_shot_stream(self, http_srv):
        prompt = base64.b64encode(np.zeros(1600, np.int16).tobytes()).decode()
        conn = http.client.HTTPConnection("127.0.0.1", 50911)
        conn.request(
            "POST", "/inference_zero_shot",
            json.dumps({"tts_text": "hi", "prompt_text": "p", "prompt_audio_b64": prompt}),
        )
        resp = conn.getresponse()
        assert resp.status == 200
        pcm = np.frombuffer(resp.read(), np.int16)
        assert len(pcm) == 1500
        assert pcm[0] > 3000  # 0.1 * 32767

    def test_bad_endpoint(self, http_srv):
        conn = http.client.HTTPConnection("127.0.0.1", 50911)
        conn.request("POST", "/nope", "{}")
        assert conn.getresponse().status == 400

    def test_metrics_endpoint(self, http_srv):
        prompt = base64.b64encode(np.zeros(1600, np.int16).tobytes()).decode()
        conn = http.client.HTTPConnection("127.0.0.1", 50911)
        conn.request(
            "POST", "/inference_zero_shot",
            json.dumps({"tts_text": "hi", "prompt_text": "p", "prompt_audio_b64": prompt}),
        )
        conn.getresponse().read()
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        m = json.loads(resp.read())
        assert m["requests"].get("inference_zero_shot", 0) >= 1
        assert m["audio_seconds"] > 0

    def test_metrics_reset(self, http_srv):
        """POST /metrics/reset clears counters + audio seconds so a benchmark
        window starts clean (warmup requests otherwise pollute percentiles)."""
        prompt = base64.b64encode(np.zeros(1600, np.int16).tobytes()).decode()
        conn = http.client.HTTPConnection("127.0.0.1", 50911)
        conn.request(
            "POST", "/inference_zero_shot",
            json.dumps({"tts_text": "hi", "prompt_text": "p", "prompt_audio_b64": prompt}),
        )
        conn.getresponse().read()
        conn.request("POST", "/metrics/reset", "")
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["ok"] is True
        conn.request("GET", "/metrics")
        m = json.loads(conn.getresponse().read())
        assert m["requests"] == {} or m["requests"].get("inference_zero_shot", 0) == 0
        assert m["audio_seconds"] == 0.0

    def test_metrics_unknown_get_404(self, http_srv):
        conn = http.client.HTTPConnection("127.0.0.1", 50911)
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404

    def test_stream_flag_string_coercion(self):
        """Multipart form values are strings: 'false'/'0' must disable
        streaming (bool('false') is True — the trap _truthy avoids)."""
        from cosyvoice_tpu.serving.http_server import _truthy

        assert _truthy(True) and _truthy("true") and _truthy("1") and _truthy("Yes")
        assert not _truthy(False) and not _truthy("false") and not _truthy("0") and not _truthy("")

    def test_index_web_page(self, http_srv):
        conn = http.client.HTTPConnection("127.0.0.1", 50911)
        conn.request("GET", "/")
        resp = conn.getresponse()
        assert resp.status == 200
        page = resp.read().decode()
        assert "<!doctype html>" in page
        # page drives every public endpoint and embeds the model sample rate
        for ep in ("inference_zero_shot", "inference_cross_lingual",
                   "inference_instruct2", "inference_sft", "inference_instruct"):
            assert ep in page
        assert "const SR = 24000" in page


class TestGRPCServing:
    def test_inference_stream(self, grpc_srv):
        from cosyvoice_tpu.serving.grpc_client import inference

        pcm = inference(
            "127.0.0.1", 50912, "zero_shot",
            tts_text="hi", prompt_text="p", prompt_audio=np.zeros(1600, np.int16).tobytes(),
        )
        assert len(pcm) == 1500

    def test_sft_mode(self, grpc_srv):
        from cosyvoice_tpu.serving.grpc_client import inference

        pcm = inference("127.0.0.1", 50912, "sft", tts_text="hi", spk_id="s1")
        assert len(pcm) == 1500


class TestBenchClient:
    def test_sweep_against_stdlib_server(self, http_srv):
        import base64

        from cosyvoice_tpu.tools.bench_client import sweep

        body = {
            "tts_text": "hi",
            "prompt_text": "p",
            "prompt_audio_b64": base64.b64encode(np.zeros(1600, np.int16).tobytes()).decode(),
        }
        res = sweep("127.0.0.1", 50911, "inference_zero_shot", body, [1, 2], 3, 24000)
        assert len(res) == 2
        assert res[0]["errors"] == 0 and res[0]["n_requests"] == 3
        assert res[0]["audio_s_total"] > 0 and res[0]["rtf"] > 0


class TestRewardServer:
    def test_reward_roundtrip_with_http_reward_client(self):
        """KServe v2 protocol round trip: server (reward_server) <-> client
        (train.grpo.http_reward), with a fake token2wav model + echo ASR."""
        from cosyvoice_tpu.serving.reward_server import cer, make_reward_fn, make_server
        from cosyvoice_tpu.train.grpo import http_reward

        class FakeEngine:
            def token2wav(self, state, tokens, *a, **kw):
                return np.zeros((1, len(tokens) * 480), np.float32)

        class FakeFlowCfg:
            class cfg:
                spk_embed_dim = 192

        class FakeRewardModel:
            sample_rate = 24000
            engine = FakeEngine()
            flow = FakeFlowCfg()

        # ASR that returns the right text iff enough tokens were synthesized
        def asr(wav, sr):
            return "hello world" if wav.size >= 3 * 480 else "hxllo"

        srv = make_server(make_reward_fn(FakeRewardModel(), asr), host="127.0.0.1", port=50913)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            reward = http_reward("http://127.0.0.1:50913/v2/models/reward/infer")
            good = reward(np.asarray([1, 2, 3, 4], np.int32), "hello world")
            bad = reward(np.asarray([1], np.int32), "hello world")
            assert good == 1.0
            assert 0.0 <= bad < 1.0
        finally:
            srv.shutdown()

    def test_cer(self):
        from cosyvoice_tpu.serving.reward_server import cer

        assert cer("hello world", "hello world") == 0.0
        assert cer("Hello, world!", "hello world") == 0.0  # punctuation/case stripped
        assert 0.0 < cer("hxllo world", "hello world") < 0.5
        assert cer("", "abc") == 1.0
