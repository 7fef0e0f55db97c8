from .rttm_gen import probs_to_turns, median_filter, hysteresis_smooth  # noqa: F401
