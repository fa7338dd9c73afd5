from cosyvoice_tpu.ops.stft import stft, istft, frame_signal, hann_window
from cosyvoice_tpu.ops.mel import (
    mel_filterbank_slaney,
    mel_filterbank_htk,
    mel_spectrogram,
    whisper_log_mel,
    kaldi_fbank,
)
from cosyvoice_tpu.ops.masks import (
    make_pad_mask,
    make_non_pad_mask,
    subsequent_chunk_mask,
    add_optional_chunk_mask,
    mask_to_bias,
)
from cosyvoice_tpu.ops.sampling import ras_sampling, nucleus_sampling
from cosyvoice_tpu.ops.resample import (
    interpolate_nearest,
    interpolate_linear,
    repeat_interleave_time,
)
from cosyvoice_tpu.ops.window import fade_in_out, hamming_window
