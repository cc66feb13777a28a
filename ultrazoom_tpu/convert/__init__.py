from ultrazoom_tpu.convert.torch_import import (
    flatten_tree,
    strip_compile_prefix,
    torch_state_dict_to_tree,
    unflatten_to_lists,
)

__all__ = [
    "flatten_tree",
    "strip_compile_prefix",
    "torch_state_dict_to_tree",
    "unflatten_to_lists",
]
