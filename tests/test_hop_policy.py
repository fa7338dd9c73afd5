"""Streaming hop-growth policies (reference Triton consumer,
runtime/triton_trtllm/model_repo/cosyvoice2/1/model.py:386-429):

  doubling     — the cli engine's fixed 25->50->100 schedule (cli/model.py:360)
  exponential  — base * 2**chunk_index, uncapped (model.py:408-409)
  time_based   — latency-adaptive (model.py:410-427): grow the hop to consume
                 the pending LM backlog only when the audio-buffer headroom
                 (emitted audio seconds minus elapsed wall seconds) exceeds
                 2/4 average chunk processing times; otherwise stay at the
                 base hop for lowest latency to the next emission.

Unit tests drive next_hop() directly; the engine-level tests drive
CosyVoice2Engine.tts with a stubbed token2wav whose speed is controlled, and
assert the chunk schedule adapts (fast t2w with a backlog -> one big hop;
slow t2w -> base hops throughout; doubling -> timing-independent).
"""

import time
from types import SimpleNamespace

import numpy as np
import pytest

from cosyvoice_tpu.runtime.engine import CosyVoice2Engine
from cosyvoice_tpu.utils.profiling import StageTimer


def make_policy(policy: str, base: int = 25) -> CosyVoice2Engine:
    """Bare engine carrying only the state next_hop() reads."""
    eng = CosyVoice2Engine.__new__(CosyVoice2Engine)
    eng.token_hop_len = base
    eng.token_max_hop_len = 4 * base
    eng.stream_scale_factor = 2
    eng.token_rate = 25
    eng.hop_policy = policy
    return eng


class TestNextHopUnit:
    def test_doubling_schedule(self):
        eng = make_policy("doubling")
        hop, hops = eng.token_hop_len, []
        for ci in range(4):
            hop = eng.next_hop(hop, ci, elapsed_s=1.0, token_offset=25 * (ci + 1), n_pending=100)
            hops.append(hop)
        assert hops == [50, 100, 100, 100]  # x2 capped at 4*base

    def test_exponential_schedule(self):
        eng = make_policy("exponential")
        hops = [eng.next_hop(25, ci, elapsed_s=1.0, token_offset=0, n_pending=0) for ci in range(4)]
        assert hops == [25, 50, 100, 200]  # uncapped, delayed one chunk

    def test_time_based_first_chunk_stays_base(self):
        eng = make_policy("time_based")
        assert eng.next_hop(25, 0, elapsed_s=0.01, token_offset=25, n_pending=100) == 25

    def test_time_based_headroom_consumes_pending(self):
        eng = make_policy("time_based")
        # 3 s of audio emitted in 0.3 s: multiples = (3-0.3)/0.1 = 27 > 4
        # -> round the 60-token backlog UP to the next hop multiple
        assert eng.next_hop(25, 2, elapsed_s=0.3, token_offset=75, n_pending=60) == 75

    def test_time_based_moderate_headroom_rounds_down(self):
        eng = make_policy("time_based")
        # multiples = (3 - 2.1) / 0.3 = 3.0 -> between 2 and 4: round DOWN
        assert eng.next_hop(25, 6, elapsed_s=2.1, token_offset=75, n_pending=60) == 50

    def test_time_based_behind_realtime_stays_base(self):
        eng = make_policy("time_based")
        # elapsed exceeds emitted audio: no headroom -> base hop
        assert eng.next_hop(100, 2, elapsed_s=3.5, token_offset=75, n_pending=200) == 25

    def test_unknown_policy_rejected(self):
        # the policy assert fires before any model attribute is touched
        with pytest.raises(AssertionError):
            CosyVoice2Engine(None, None, None, None, None, None, hop_policy="bogus")


BASE = 5  # tiny hop so the schedule plays out quickly


def make_engine(policy: str, t2w_delay: float) -> CosyVoice2Engine:
    eng = make_policy(policy, base=BASE)
    eng.lm = SimpleNamespace(cfg=SimpleNamespace(speech_token_size=20))
    eng.flow = SimpleNamespace(cfg=SimpleNamespace(vocab_size=20))
    eng.scheduler = None
    eng.pre_lookahead_len = 3
    eng.timer = StageTimer()
    eng._calls = []

    def fake_t2w(state, tokens, prompt_token, prompt_feat, embedding,
                 token_offset, stream=False, finalize=False, speed=1.0):
        eng._calls.append((int(token_offset), len(tokens), bool(finalize)))
        if not finalize:
            time.sleep(t2w_delay)
        return np.zeros((1, 480), np.float32)

    eng.token2wav = fake_t2w
    return eng


def run_stream(eng, n_tokens=30):
    toks = np.zeros(n_tokens, np.int32)
    outs = list(eng.tts(
        text_tokens=np.zeros(4, np.int32),
        prompt_text_tokens=np.zeros(0, np.int32),
        llm_prompt_speech_token=np.zeros(0, np.int32),
        flow_prompt_speech_token=np.zeros(0, np.int32),
        prompt_speech_feat=np.zeros((1, 0, 80), np.float32),
        flow_embedding=np.zeros((1, 192), np.float32),
        stream=True,
        token_generator=iter([toks]),
    ))
    offsets = [c[0] for c in eng._calls if not c[2]]
    return outs, offsets


class TestEngineHopPolicies:
    def test_doubling_schedule_is_timing_independent(self):
        # 30 tokens, base 5: 5 -> 10 (then 20+la doesn't fit) -> finalize
        for delay in (0.0, 0.2):
            eng = make_engine("doubling", t2w_delay=delay)
            outs, offsets = run_stream(eng)
            assert offsets == [0, 5], offsets
            assert eng._calls[-1][2] is True

    def test_time_based_fast_t2w_consumes_backlog(self):
        # instant t2w, whole LM output already buffered: after chunk 1 the
        # headroom is huge -> hop jumps to cover the 20-token backlog (25),
        # which exceeds pending+lookahead -> the stream finalizes in one go
        eng = make_engine("time_based", t2w_delay=0.001)
        outs, offsets = run_stream(eng)
        assert offsets == [0, 5], offsets
        assert len(outs) == 3  # two small chunks + one backlog-consuming finalize

    def test_time_based_slow_t2w_stays_at_base_hop(self):
        # t2w slower than realtime (0.25 s per 0.2 s of audio): no headroom
        # ever builds -> every chunk stays at the base hop for latency
        eng = make_engine("time_based", t2w_delay=0.25)
        outs, offsets = run_stream(eng)
        assert offsets == [0, 5, 10, 15, 20], offsets
        assert len(outs) == 6  # five base chunks + finalize
