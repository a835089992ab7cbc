"""sincformer_tpu — TPU-native speech-enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MarvelMathesh/sincformer-metacog-speech-enhancement (reference mounted at
/root/reference, studied for behaviour only — no code copied):

  * auditory DSP front-end (gammatone filterbank, Meddis hair cell,
    AMS / RASTA-PLP / MFCC / GFCC features) as batched, jit-able functions
  * oracle T-F masks (IRM / PCIRM / OPT-PCIRM) with PSO-optimised quantization
  * model zoo: 5-layer mask DNN (+ RBM pretraining), ComplexConformer,
    DCSE SpeechEnhancer, VQ-STE quantizer, and the fully *wired*
    multi-agent "Sincformer metacog" stack (PA / CPEA / MSA / MAA / memory)
  * training engines with curriculum, SI-SNR + multi-resolution-STFT and
    perceptual/adversarial losses, Orbax checkpointing with true resume
  * 5-metric evaluation suite (STOI, PESQ, SSNR, CSII, NCM) batched on device
  * SPMD scaling via jax.sharding.Mesh + shard_map over ICI

Package layout mirrors SURVEY.md §7: dsp/ masks/ optim/ ops/ models/
agents/ train/ data/ evaluation/ parallel/ utils/.
"""

__version__ = "0.1.0"

from sincformer_tpu import config  # noqa: F401
