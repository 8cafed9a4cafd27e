from .block_allocator import BlockAllocator
from .block_table import BlockTable
from .scheduler import (ScheduledPrefill, Scheduler, SchedulerOutput,
                        SeqWindowPlan)
from .sequence import Sequence, SequenceStatus

__all__ = [
    "BlockAllocator",
    "BlockTable",
    "ScheduledPrefill",
    "Scheduler",
    "SchedulerOutput",
    "SeqWindowPlan",
    "Sequence",
    "SequenceStatus",
]
