

def test_source_reputation_gate(ray_session, tmp_path):
    """Integer-rational accept boundary and the broadcast filter: a
    source at exactly the threshold is accepted (>=), one below is
    rejected, and source_filter keeps exactly the accepted sources'
    docs."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages import textops

    good = ("the of and to in is it " * 25).strip()  # stopwordy, no punct, >100 chars
    bad = "xx"
    rows = []
    # srcA: 2/2 good -> 1000*2 >= 950*2 accepted
    rows += [(1, good, "srcA"), (2, good, "srcA")]
    # srcB: 1/2 good -> 500 millis < 950 rejected
    rows += [(3, good, "srcB"), (4, bad, "srcB")]
    tbl = pa.table(pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rep = textops.source_reputation(str(tmp_path)).to_pandas()
    rep = rep.set_index("source")
    assert rep.loc["srcA", "accepted"] == 1 and rep.loc["srcA", "n_ok"] == 2
    assert rep.loc["srcB", "accepted"] == 0 and rep.loc["srcB", "n_ok"] == 1

    kept = textops.source_filter(str(tmp_path)).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 2]
    assert set(kept["source"]) == {"srcA"}
