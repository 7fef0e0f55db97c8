from .der import DerResult, score_der  # noqa: F401
