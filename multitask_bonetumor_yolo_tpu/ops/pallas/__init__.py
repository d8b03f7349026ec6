"""Pallas TPU kernels for the hot blocks."""

from .convnext_block import (
    convnext_block,
    convnext_block_padded,
    convnext_block_ref,
    pad_for_blocks,
    unpad_from_blocks,
)

__all__ = [
    "convnext_block",
    "convnext_block_padded",
    "convnext_block_ref",
    "pad_for_blocks",
    "unpad_from_blocks",
]
