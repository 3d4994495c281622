"""ComfyUI custom-node package for mixdq_tpu (counterpart of the
reference's ComfyUI plugin: root __init__.py exporting
NODE_CLASS_MAPPINGS from kernels/mixdq.py; ComfyUI/README.md:45-57).

Symlink or copy this directory into ComfyUI/custom_nodes/ with the repo
on PYTHONPATH. Degrades gracefully when ComfyUI (or a TPU) is absent.
"""

from .nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
