from .chunked import infer_recording, infer_dataset  # noqa: F401
