from . import wav, rttm, kaldi_io  # noqa: F401
