"""End-to-end through the flat embedding API (the reference's
BasicEndToEndTest / EndToEndIndexingSearchTest analogue, driven through the
C-API-equivalent surface)."""

import diagon_tpu.api as dg


def test_full_lifecycle(tmp_path):
    path = str(tmp_path / "idx")
    w = dg.open_writer(path, max_buffered_docs=3)
    dg.add_document(w, {"body": "oil price rises on supply cuts",
                        "views": 10, "tag!": "energy",
                        "_stored": {"id": "a"}})
    dg.add_document(w, {"body": "trade deficit widens",
                        "views": 20, "_stored": {"id": "b"}})
    dg.add_document(w, {"body": "oil futures fall; price drops",
                        "views": 30, "_stored": {"id": "c"}})
    dg.add_document(w, {"body": "grain exports steady",
                        "views": 40, "_stored": {"id": "d"}})
    dg.commit(w)
    dg.force_merge(w, 1)
    dg.commit_merge_results(w)
    dg.close_writer(w)

    r = dg.open_reader(path)
    assert dg.num_docs(r) == 4
    s = dg.open_searcher(r)

    hits = dg.search(s, dg.term_query("body", "oil"), k=10)
    assert sorted(d for d, _ in hits) == [0, 2]
    assert dg.get_document(r, hits[0][0])["id"] in ("a", "c")

    total, _ = dg.search_with_total(
        s,
        dg.boolean_query(should=[dg.term_query("body", "oil"),
                                 dg.term_query("body", "trade")]),
    )
    assert total == 3

    hits = dg.search(s, dg.phrase_query("body", ["oil", "price"]), k=10)
    assert [d for d, _ in hits] == [0]

    hits = dg.search(s, dg.numeric_range_query("views", 15, 35), k=10)
    assert sorted(d for d, _ in hits) == [1, 2]
    hits = dg.search(s, dg.point_range_query("views", 35, None), k=10)
    assert [d for d, _ in hits] == [3]

    assert dg.count(s, dg.term_query("tag", "energy")) == 1
    assert dg.count(s, dg.match_all_query()) == 4

    # update + reopen
    w = dg.open_writer(path)
    dg.update_document(w, "body", "grain",
                       {"body": "grain exports surge", "_stored": {"id": "d2"}})
    dg.commit(w)
    dg.close_writer(w)
    r2 = dg.reopen(r)
    s2 = dg.open_searcher(r2)
    assert dg.count(s2, dg.term_query("body", "surge")) == 1
    assert dg.count(s2, dg.term_query("body", "steady")) == 0


def test_profiler_hooks(tmp_path):
    from diagon_tpu.observability import QueryProfiler

    path = str(tmp_path / "idx")
    w = dg.open_writer(path)
    dg.add_document(w, {"body": "oil price"})
    dg.commit(w)
    dg.close_writer(w)
    s = dg.open_searcher(dg.open_reader(path))

    p = QueryProfiler.enable()
    dg.search(s, dg.term_query("body", "oil"))
    rep = p.report()
    assert "plan" in rep and "execute" in rep and "merge" in rep
    assert rep["execute"]["count"] == 1
