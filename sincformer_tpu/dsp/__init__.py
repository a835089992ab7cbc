"""Pure-function signal-processing core (SURVEY.md §7 `dsp/`)."""

from sincformer_tpu.dsp.stft import stft, istft, stft_uncentered  # noqa: F401
from sincformer_tpu.dsp.gammatone import (  # noqa: F401
    erb_bandwidth,
    erb_space,
    gammatone_impulse_response,
    GammatoneFilterbank,
)
from sincformer_tpu.dsp.haircell import MeddisHairCell  # noqa: F401
from sincformer_tpu.dsp.features import (  # noqa: F401
    extract_ams,
    extract_rasta_plp,
    extract_mfcc,
    extract_gfcc,
    FeatureExtractor,
    mel_filterbank,
    hz_to_mel,
    mel_to_hz,
    hz_to_bark,
    bark_to_hz,
)
