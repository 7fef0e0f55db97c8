from .chunked import infer_recording, infer_dataset, tsvad_infer_dataset  # noqa: F401
from .embeddings import EmbeddingStore, chunk_embeddings  # noqa: F401
