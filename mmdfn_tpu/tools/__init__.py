"""Migration utilities for users coming from the reference implementation."""

from mmdfn_tpu.tools.import_torch_checkpoint import (  # noqa: F401
    state_dict_to_params,
    import_reference_checkpoint,
)
