"""Index layer: write/read lifecycle.

Equivalent of the reference's ``diagon/index/`` (SURVEY.md section 2.4):
IndexWriter + in-memory buffer + flush to immutable segment artifacts,
SegmentInfos manifest commits, DirectoryReader over segments, tiered merge.
"""

from diagon_tpu.index.memory_index import MemoryIndex  # noqa: F401
from diagon_tpu.index.segment import (  # noqa: F401
    SegmentData,
    SegmentFieldData,
    SegmentInfo,
    SegmentInfos,
)
# Writer/reader/merge are imported lazily to avoid import cycles during
# partial builds; see diagon_tpu.index.writer / .reader / .merge.
try:  # pragma: no cover
    from diagon_tpu.index.writer import IndexWriter, IndexWriterConfig  # noqa: F401
    from diagon_tpu.index.reader import DirectoryReader, SegmentReader  # noqa: F401
    from diagon_tpu.index.merge import (  # noqa: F401
        TieredMergePolicy,
        MergeSpecification,
        OneMerge,
        SegmentMerger,
    )
except ImportError:
    pass
