"""flax.linen model zoo: the TS-Conformer transducer (flagship) plus the
broader reference surface — WavLM-XVector, ECAPA-TDNN/Xvector speaker
models, CRDNN/LiGRU, attentional seq2seq decoder, RNN-LM, SincConv,
Tacotron2 + HiFi-GAN TTS — all parity-pinned against the reference."""

from tsasr_tpu.models.attention import (  # noqa: F401
    RelPosMHAXL,
    rel_pos_encoding,
)
from tsasr_tpu.models.conformer import (  # noqa: F401
    ConformerEncoderLayer,
    ConvolutionModule,
    TSConformerEncoder,
)
from tsasr_tpu.models.frontend import ConvolutionFrontEnd  # noqa: F401
from tsasr_tpu.models.rnn import LSTM  # noqa: F401
from tsasr_tpu.models.transducer import (  # noqa: F401
    OneHotEmbedding,
    Predictor,
    TSTransducer,
)
from tsasr_tpu.models.rnn import GRU, BiLSTM, LiGRU, VanillaRNN  # noqa: F401
from tsasr_tpu.models.lm import RNNLM, RNNLMConfig  # noqa: F401
from tsasr_tpu.models.wavlm import WavLMConfig, WavLMForXVector  # noqa: F401
from tsasr_tpu.models.ecapa import (  # noqa: F401
    ECAPA_TDNN,
    ECAPAConfig,
    CosineClassifier,
    Xvector,
    XvectorConfig,
)
from tsasr_tpu.models.crdnn import CRDNN, CRDNNConfig  # noqa: F401
from tsasr_tpu.models.seq2seq import (  # noqa: F401
    Seq2SeqDecoder,
    Seq2SeqDecoderConfig,
)
from tsasr_tpu.models.sinc import SincConv  # noqa: F401
from tsasr_tpu.models.tacotron2 import Tacotron2, Tacotron2Config  # noqa: F401
from tsasr_tpu.models.hifigan import (  # noqa: F401
    HifiganConfig,
    HifiganGenerator,
)
