"""Host-side input pipeline (SURVEY.md §7 `data/`)."""

from sincformer_tpu.data.audio import load_audio, add_noise_at_snr  # noqa: F401
from sincformer_tpu.data.synthetic import (synthetic_speech,  # noqa: F401
                                           synthetic_speech_varied,
                                           synthetic_noise)
from sincformer_tpu.data.loader import (  # noqa: F401
    WaveformDataset,
    find_speech_files,
    load_noise_signals,
    train_test_split,
    batch_iterator,
)
