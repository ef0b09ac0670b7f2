"""Flat embedding API — the stable integration surface.

The role of the reference's C API (``c_api/diagon_c_api.h:48-307``: flat
handle-based functions over writer/reader/searcher/document for FFI
embedders). In a Python-first framework the embedding surface is a small,
stable module of plain functions over opaque handles; everything maps 1:1
to a ``diagon_*`` C function in the reference.

    import diagon_tpu.api as dg
    w = dg.open_writer("/tmp/idx")
    dg.add_document(w, {"body": "oil price rises", "views": 42})
    dg.commit(w)
    dg.close_writer(w)

    r = dg.open_reader("/tmp/idx")
    s = dg.open_searcher(r)
    hits = dg.search(s, dg.term_query("body", "oil"), k=10)
    # hits = [(global_docid, score), ...]
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

from diagon_tpu.document.document import (
    Document,
    LongPointField,
    NumericDocValuesField,
    StoredField,
    StringField,
    TextField,
)
from diagon_tpu.index.reader import DirectoryReader
from diagon_tpu.index.writer import IndexWriter, IndexWriterConfig
from diagon_tpu.search.query import (
    BooleanQuery,
    MatchAllDocsQuery,
    NumericRangeQuery,
    Occur,
    PhraseQuery,
    PointRangeQuery,
    Query,
    TermQuery,
)
from diagon_tpu.search.searcher import IndexSearcher
from diagon_tpu.store.directory import FSDirectory


# -- directories / writer lifecycle (diagon_directory_*, diagon_writer_*) --

def open_writer(
    path: str,
    ram_buffer_mb: float = 16.0,
    max_buffered_docs: int = -1,
    open_mode: str = "CREATE_OR_APPEND",
) -> IndexWriter:
    return IndexWriter(
        FSDirectory(path),
        IndexWriterConfig(
            ram_buffer_mb=ram_buffer_mb,
            max_buffered_docs=max_buffered_docs,
            open_mode=open_mode,
        ),
    )


def add_document(writer: IndexWriter, doc: Union[Document, Dict]) -> int:
    """Dict values: str -> TextField; int -> NumericDocValues+LongPoint;
    '<name>!' keyword suffix -> StringField; stored under '_stored'."""
    if isinstance(doc, dict):
        doc = make_document(doc)
    return writer.add_document(doc)


def make_document(fields: Dict) -> Document:
    d = Document()
    for name, value in fields.items():
        if name == "_stored" and isinstance(value, dict):
            for k, v in value.items():
                d.add(StoredField(k, v))
        elif name.endswith("!"):
            d.add(StringField(name[:-1], str(value)))
        elif isinstance(value, bool):
            d.add(StringField(name, "true" if value else "false"))
        elif isinstance(value, int):
            d.add(NumericDocValuesField(name, value))
            d.add(LongPointField(name, value))
        else:
            d.add(TextField(name, str(value)))
    return d


def delete_documents(writer: IndexWriter, field: str, term: str) -> int:
    return writer.delete_documents(field, term)


def update_document(writer, field: str, term: str, doc: Union[Document, Dict]) -> int:
    if isinstance(doc, dict):
        doc = make_document(doc)
    return writer.update_document(field, term, doc)


def flush(writer: IndexWriter) -> None:
    writer.flush()


def commit(writer: IndexWriter) -> int:
    return writer.commit()


def force_merge(writer: IndexWriter, max_segments: int = 1) -> None:
    writer.force_merge(max_segments)


def wait_for_merges(writer: IndexWriter) -> None:
    writer.wait_for_merges()


def commit_merge_results(writer: IndexWriter) -> int:
    return writer.commit_merge_results()


def rollback(writer: IndexWriter) -> None:
    writer.rollback()


def close_writer(writer: IndexWriter) -> None:
    writer.close()


# -- reader / searcher (diagon_reader_*, diagon_searcher_*) ----------------

def open_reader(path: str) -> DirectoryReader:
    return DirectoryReader.open(FSDirectory(path))


def reopen(reader: DirectoryReader) -> DirectoryReader:
    return reader.reopen()


def open_searcher(reader: DirectoryReader) -> IndexSearcher:
    return IndexSearcher(reader)


def num_docs(reader: DirectoryReader) -> int:
    return reader.num_docs()


def get_document(reader: DirectoryReader, doc_id: int) -> Dict:
    return reader.document(doc_id)


# -- queries (diagon_query_*) -----------------------------------------------

def term_query(field: str, text: str, boost: float = 1.0) -> TermQuery:
    return TermQuery(field, text, boost)


def boolean_query(
    must: Sequence[Query] = (),
    should: Sequence[Query] = (),
    filter_: Sequence[Query] = (),
    must_not: Sequence[Query] = (),
    minimum_should_match: int = 0,
) -> BooleanQuery:
    b = BooleanQuery.Builder()
    for q in must:
        b.add(q, Occur.MUST)
    for q in should:
        b.add(q, Occur.SHOULD)
    for q in filter_:
        b.add(q, Occur.FILTER)
    for q in must_not:
        b.add(q, Occur.MUST_NOT)
    b.set_minimum_number_should_match(minimum_should_match)
    return b.build()


def phrase_query(field: str, terms: Sequence[str]) -> PhraseQuery:
    return PhraseQuery(field, list(terms))


def match_all_query() -> MatchAllDocsQuery:
    return MatchAllDocsQuery()


def numeric_range_query(field: str, lower=None, upper=None) -> NumericRangeQuery:
    return NumericRangeQuery(field, lower, upper)


def point_range_query(field: str, lower=None, upper=None) -> PointRangeQuery:
    return PointRangeQuery(field, lower, upper)


# -- execution ---------------------------------------------------------------

def search(
    searcher: IndexSearcher, query: Query, k: int = 10
) -> List[Tuple[int, float]]:
    td = searcher.search(query, k)
    return [(sd.doc, sd.score) for sd in td.score_docs]


def search_with_total(searcher: IndexSearcher, query: Query, k: int = 10):
    td = searcher.search(query, k)
    return td.total_hits, [(sd.doc, sd.score) for sd in td.score_docs]


def count(searcher: IndexSearcher, query: Query) -> int:
    return searcher.count(query)
