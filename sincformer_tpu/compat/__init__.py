"""Migration utilities for users of the PyTorch reference."""

from sincformer_tpu.compat.torch_import import (  # noqa: F401
    import_dnn_state_dict,
    import_dcse_state_dict,
    load_reference_checkpoint,
)
from sincformer_tpu.compat.torch_export import (  # noqa: F401
    export_dcse_state_dict,
    save_reference_checkpoint,
)
