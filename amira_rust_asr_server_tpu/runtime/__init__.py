"""Runtime: compiled pipeline, continuous batcher, stream sessions.

The in-process replacement for the reference's Triton client stack
(ref: src/triton/ + src/asr/pipeline.rs).
"""

from .batcher import ContinuousBatcher
from .incremental import IncrementalAsr
from .pipeline import AsrPipeline, StreamState

__all__ = ["AsrPipeline", "StreamState", "ContinuousBatcher",
           "IncrementalAsr"]
