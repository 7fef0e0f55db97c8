from .fbank_pallas import fbank_pallas, logmel_pallas  # noqa: F401
from .selective_scan_pallas import selective_scan_fused, selective_scan_pallas  # noqa: F401
