from .transformer import TransformerEncoder  # noqa: F401
from .eend import EENDModel  # noqa: F401
from .eda import EendEdaModel, EncoderDecoderAttractor  # noqa: F401
from .campplus import CAMPPlus  # noqa: F401
from .tsvad import TSVADModel, TSVADConfig  # noqa: F401
