"""Document model: Document, typed Fields, JSON parsing, index mapping.

Equivalent of the reference's document layer (``diagon/document/``,
SURVEY.md section 2.6).
"""

from diagon_tpu.document.document import (  # noqa: F401
    BinaryDocValuesField,
    Document,
    DoubleDocValuesField,
    DoublePointField,
    Field,
    FieldType,
    IndexOptions,
    DocValuesType,
    LongPointField,
    NumericDocValuesField,
    SortedDocValuesField,
    SortedNumericDocValuesField,
    SortedSetDocValuesField,
    StoredField,
    StringField,
    TextField,
)
from diagon_tpu.document.json_parser import JsonDocumentParser  # noqa: F401
from diagon_tpu.document.mapping import IndexMapping  # noqa: F401
