"""Multi-LoRA serving (reference vllm/lora/ — punica SGMV/BGMV kernels,
per-request adapter switching; SURVEY C15).

TPU-native design: no custom gather-matmul kernels.  All adapters live in
preallocated stacked device arrays ``[num_layers, max_loras+1, in, r]`` /
``[num_layers, max_loras+1, r, out]`` that ride inside the params pytree,
so the jitted step programs never retrace when adapters are added or
swapped — adding an adapter is a device-side slot write.  Slot 0 is the
zero adapter (requests without LoRA), so per-token application is a
branch-free gather:

    y += scale[idx] * (x @ A[idx]) @ B[idx]

For single-sequence prefill the index is a traced scalar (slice, then two
thin matmuls — MXU-friendly); for the decode window it is a [B] gather of
[B, in, r] slices (B <= max_num_seqs, a few MB).  This is the semantic
equivalent of punica's SGMV "segmented" batching, realized by XLA gather
fusion instead of a CUDA kernel.
"""

from .models import LoRAConfig, LoRARequest, lora_delta  # noqa: F401
from .manager import LoRAManager  # noqa: F401
