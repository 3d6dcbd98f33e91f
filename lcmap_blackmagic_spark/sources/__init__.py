from .fixtures import synth_ard, synth_aux, synth_segments, UBID_BANDS

__all__ = ["synth_ard", "synth_aux", "synth_segments", "UBID_BANDS"]
