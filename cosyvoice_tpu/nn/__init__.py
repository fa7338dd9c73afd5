from cosyvoice_tpu.nn.conv import (
    Conv1d,
    WNConv1d,
    WNConvTranspose1d,
    CausalConv1d,
    CausalConv1dDownSample,
    CausalConv1dUpsample,
    ConvolutionModule,
)
from cosyvoice_tpu.nn.embedding import (
    EspnetRelPositionalEncoding,
    SinusoidalPosEmb,
    apply_rope,
    rope_frequencies,
)
from cosyvoice_tpu.nn.attention import MultiHeadAttention, RelPositionMultiHeadAttention
from cosyvoice_tpu.nn.conformer import (
    PositionwiseFeedForward,
    ConformerEncoderLayer,
    ConformerEncoder,
    UpsampleConformerEncoder,
    PreLookaheadLayer,
)
from cosyvoice_tpu.nn.unet import (
    Block1D,
    ResnetBlock1D,
    CausalBlock1D,
    Downsample1D,
    Upsample1DTranspose,
    TimestepEmbedding,
    BasicTransformerBlock,
)
from cosyvoice_tpu.nn.activation import snake, mish
