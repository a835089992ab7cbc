"""Model zoo (SURVEY.md §2 L4): DNN, RBM, Conformers, DCSE, VQ."""

from sincformer_tpu.models.dnn import SpeechEnhancementDNN, create_dnn  # noqa: F401
from sincformer_tpu.models.rbm import RBM, pretrain_dnn_with_rbm  # noqa: F401
from sincformer_tpu.models.conformer import (  # noqa: F401
    FeedForwardModule,
    MultiHeadSelfAttention,
    ConvolutionModule,
    ConformerBlock,
    ComplexConformer,
)
from sincformer_tpu.models.dcse import SpeechEnhancer  # noqa: F401
from sincformer_tpu.models.vq import VectorQuantizer, VQMaskQuantizer  # noqa: F401
