"""Pallas TPU kernels: the compute-path analog of the reference's csrc/
CUDA kernel library (SURVEY C12).  Each kernel has a pure-jnp oracle in
``ops/`` and is tested against it (CPU interpret mode) in
tests/ops/test_pallas_kernels.py.
"""

from .paged_attention import paged_decode_attention_pallas  # noqa: F401
from .prefill_attention import (flash_context_prefill_attention,  # noqa: F401
                                flash_prefill_attention)  # noqa: F401
