"""LM training collation: unified uni/bi-stream interleave + DPO.

Host-side (numpy) re-derivation of Qwen2LM.prepare_lm_input_target
(cosyvoice/llm/llm.py:302-349): with probability 0.5 — when the sample has
enough speech per text token — the sequence is laid out in bistream order
(5 text / 15 speech blocks with a fill-token target at each block end);
otherwise unistream [sos][instruct?][text][task][speech][eos].

Sequences are (ids, types) pairs consumed by Qwen2LMModule.embed_input, so
the interleave costs nothing on device.
"""

import random
from typing import Optional, Tuple

import numpy as np

from cosyvoice_tpu.models.llm import LMConfig, TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT
from cosyvoice_tpu.train.losses import IGNORE_ID


def build_lm_sample(
    cfg: LMConfig,
    text: np.ndarray,
    speech: np.ndarray,
    instruct: Optional[np.ndarray] = None,
    rng: Optional[random.Random] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (ids, types, targets) for one sample."""
    rng = rng or random
    mt, ms = cfg.mix_ratio
    instruct = instruct if instruct is not None else np.zeros(0, np.int64)
    ids = [cfg.sos_id]
    types = [TYPE_SPECIAL]
    targets = [IGNORE_ID]
    for t in instruct:
        ids.append(int(t)); types.append(TYPE_TEXT); targets.append(IGNORE_ID)

    bistream = len(text) > 0 and len(speech) / len(text) > ms / mt and rng.random() < 0.5
    if bistream:
        n_blocks = int(np.ceil((len(text) + 1) / mt))
        for j in range(n_blocks):
            tb = text[j * mt : (j + 1) * mt]
            sb = speech[j * ms : (j + 1) * ms]
            if len(tb) == mt:
                ids.extend(int(x) for x in tb); types.extend([TYPE_TEXT] * mt)
                targets.extend([IGNORE_ID] * (mt - 1))
                ids.extend(int(x) for x in sb); types.extend([TYPE_SPEECH] * len(sb))
                targets.extend(int(x) for x in sb)
                targets.append(cfg.fill_token)
            else:
                ids.extend(int(x) for x in tb); types.extend([TYPE_TEXT] * len(tb))
                targets.extend([IGNORE_ID] * len(tb))
                ids.append(cfg.task_id); types.append(TYPE_SPECIAL)
                rest = speech[j * ms :]
                ids.extend(int(x) for x in rest); types.extend([TYPE_SPEECH] * len(rest))
                targets.extend(int(x) for x in rest)
                targets.append(cfg.eos_token)
                break
    else:
        ids.extend(int(x) for x in text); types.extend([TYPE_TEXT] * len(text))
        targets.extend([IGNORE_ID] * len(text))
        ids.append(cfg.task_id); types.append(TYPE_SPECIAL)
        ids.extend(int(x) for x in speech); types.extend([TYPE_SPEECH] * len(speech))
        targets.extend(int(x) for x in speech)
        targets.append(cfg.eos_token)
    assert len(ids) == len(targets) == len(types)
    return np.asarray(ids, np.int32), np.asarray(types, np.int32), np.asarray(targets, np.int32)


def collate_lm_batch(cfg: LMConfig, batch: dict, rng: Optional[random.Random] = None, pad_to: int = 8):
    """Padded (ids, types, targets, lengths) arrays from a processor batch."""
    samples = []
    B = batch["text_token"].shape[0]
    for i in range(B):
        text = batch["text_token"][i, : batch["text_token_len"][i]]
        speech = batch["speech_token"][i, : batch["speech_token_len"][i]]
        instruct = None
        if "instruct_token" in batch:
            instruct = batch["instruct_token"][i, : batch["instruct_token_len"][i]]
        samples.append(build_lm_sample(cfg, text, speech, instruct, rng))
    T = max(len(s[0]) for s in samples)
    T = ((T + pad_to - 1) // pad_to) * pad_to
    ids = np.zeros((B, T), np.int32)
    types = np.full((B, T), TYPE_SPEECH, np.int32)
    targets = np.full((B, T), IGNORE_ID, np.int32)
    lengths = np.zeros(B, np.int32)
    for i, (s_ids, s_types, s_tgt) in enumerate(samples):
        n = len(s_ids)
        ids[i, :n] = s_ids
        types[i, :n] = s_types
        targets[i, :n] = s_tgt
        lengths[i] = n
    return {"ids": ids, "types": types, "targets": targets, "lengths": lengths}


def dpo_loss(chosen_logps, rejected_logps, ref_chosen_logps, ref_rejected_logps, beta: float = 0.1):
    """Standard DPO sigmoid loss over per-sequence mean logps (the reference
    computes the logps in Qwen2LM.forward_dpo, llm.py:450-456)."""
    import jax.numpy as jnp

    ratio = (chosen_logps - rejected_logps) - (ref_chosen_logps - ref_rejected_logps)
    return -jnp.mean(jnp.log(jnp.clip(1.0 / (1.0 + jnp.exp(-beta * ratio)), 1e-8)))


def sequence_logps(logits, targets):
    """Per-sequence mean log-prob of target tokens (llm.py:450-455)."""
    import jax
    import jax.numpy as jnp

    valid = targets != IGNORE_ID
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)
