from .block_allocator import BlockAllocator
from .block_table import BlockTable
from .scheduler import (ScheduledDecode, ScheduledPrefill, Scheduler,
                        SchedulerOutput)
from .sequence import Sequence, SequenceStatus

__all__ = [
    "BlockAllocator",
    "BlockTable",
    "ScheduledDecode",
    "ScheduledPrefill",
    "Scheduler",
    "SchedulerOutput",
    "Sequence",
    "SequenceStatus",
]
