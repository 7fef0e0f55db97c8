from . import features, losses, metrics  # noqa: F401
