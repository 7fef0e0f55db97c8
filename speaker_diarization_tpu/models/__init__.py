from .transformer import TransformerEncoder  # noqa: F401
from .eend import EENDModel  # noqa: F401
from .eda import EendEdaModel, EncoderDecoderAttractor  # noqa: F401
from .campplus import CAMPPlus  # noqa: F401
from .tsvad import TSVADModel, TSVADConfig  # noqa: F401
from .eend_vc import EENDVCModel  # noqa: F401
from .fs_eend import FSEENDModel  # noqa: F401
from .eend_m2f import EENDM2FModel, M2FConfig  # noqa: F401
from .sond import SONDModel, SONDConfig  # noqa: F401
from .ssnd import SSNDModel, SSNDConfig  # noqa: F401
from .ots_vad import OTSVADModel, OTSVADConfig  # noqa: F401
from .streaming_tsvad import StreamingTSVADModel, StreamingTSVADConfig  # noqa: F401
from .conformer import ConformerEncoder  # noqa: F401
from .mamba import BiMambaBlock  # noqa: F401
from .wavlm import WavLMModel, WavLMFlaxConfig  # noqa: F401
from .whisper_encoder import WhisperEncoder, WhisperEncoderConfig  # noqa: F401
from .eres2net import ERes2Net  # noqa: F401
from .speaker_encoders import ECAPA_TDNN, ResNet34, SimAMResNet34, build_speaker_encoder  # noqa: F401
from .redimnet import ReDimNet  # noqa: F401
from .dicow import DiCoWEncoder, DiCoWConfig, FDDT  # noqa: F401
from .tsvad3 import TSVAD3Model, TSVAD3Config  # noqa: F401
from .vad import NeuralVAD, NeuralVADConfig  # noqa: F401
