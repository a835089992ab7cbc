"""Multi-agent "Sincformer metacog" stack (SURVEY.md §2 L5), WIRED.

The reference ships these five agents as orphaned library code — no entry
point imports them (SURVEY.md §0.2). Here they are integrated into a real
trainable model (:class:`SincformerMetacog` in ``metacog.py``) with the
DCSE post-mortem lessons applied (conformer_pipeline.py:7-30): bounded polar
mask, no identity-bias trap, few balanced losses, and differentiable
(Gumbel-softmax) MAA routing.
"""

from sincformer_tpu.agents.sincnet import SincConv1d  # noqa: F401
from sincformer_tpu.agents.perception import PerceptionAgent  # noqa: F401
from sincformer_tpu.agents.cpea import CorrelationPhaseEstimationAgent  # noqa: F401
from sincformer_tpu.agents.msa import MaskSynthesisAgent  # noqa: F401
from sincformer_tpu.agents.maa import MetacognitiveArbitrationAgent  # noqa: F401
from sincformer_tpu.agents.memory import EpisodicMemory  # noqa: F401
from sincformer_tpu.agents.metacog import SincformerMetacog  # noqa: F401
