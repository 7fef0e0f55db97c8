from .chunked import infer_recording, infer_dataset, tsvad_infer_dataset  # noqa: F401
from .embeddings import EmbeddingStore, chunk_embeddings  # noqa: F401
from .eda import eda_infer_recording, eda_infer_dataset, select_speakers  # noqa: F401
from .clustering import cluster_recording, spectral_cluster, density_cluster, energy_vad, oracle_sad  # noqa: F401
from .vbx import vbx, vbx_resegment, estimate_plda, Plda, save_plda, load_plda  # noqa: F401
