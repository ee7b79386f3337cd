"""Signal/embedding post-processing: speaker diarization."""

from tsasr_tpu.processing.diarization import (  # noqa: F401
    SpectralClusterer,
    ahc_cluster,
    diarize_segments,
    merge_ssegs_same_speaker,
    read_rttm,
    spectral_cluster,
    write_rttm,
)
