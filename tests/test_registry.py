"""Extension surface (§2.10): the plugin registries.

The reference's contract: a user subclasses ``BlockExtractionMethod``
(`prclz/blocks/methods.py:11-14`) and passes it through
``extract_blocks(extraction_method=...)``
(`prclz/blocks/extraction.py:30-36`) — the pipeline shape never
changes. Here: register a THIRD toy method and run it through the same
``extract_blocks`` pipeline; compose registered document stages."""

import numpy as np
import pyarrow as pa
import pytest

from prclz_ray.registry import DOC_STAGES, Registry, compose_stages


def test_registry_duplicate_raises_and_lookup_lists_names():
    r = Registry("toy thing")
    r.register("a", lambda: 1)
    with pytest.raises(ValueError, match="already registered"):
        r.register("a", lambda: 2)
    r.register("a", lambda: 3, replace=True)
    assert r["a"]() == 3
    with pytest.raises(KeyError, match="registered: \\['a'\\]"):
        r["nope"]
    assert "a" in r and list(r) == ["a"]


def test_third_extraction_method_runs_through_same_pipeline(ray_session):
    import ray.data

    from prclz_ray import world
    from prclz_ray.pipelines import derive

    if "whole_cell" not in derive.EXTRACTION_METHODS:

        @derive.EXTRACTION_METHODS.register("whole_cell")
        def whole_cell(group: pa.Table) -> pa.Table:
            """Toy method: one block per admin cell — the full cell
            inset by the street buffer (exercises the shared
            _emit_block id/bounds derivation with a third extractor)."""
            gadm = group.column("gadm")[0].as_py()
            x0 = min(group.column("x0").to_numpy().min(),
                     group.column("x1").to_numpy().min())
            y0 = min(group.column("y0").to_numpy().min(),
                     group.column("y1").to_numpy().min())
            x1 = max(group.column("x0").to_numpy().max(),
                     group.column("x1").to_numpy().max())
            y1 = max(group.column("y0").to_numpy().max(),
                     group.column("y1").to_numpy().max())
            eps = world.STREET_EPS_E6 / 1e6
            ring = np.array(
                [
                    [x0 + eps, y0 + eps],
                    [x1 - eps, y0 + eps],
                    [x1 - eps, y1 - eps],
                    [x0 + eps, y1 - eps],
                ]
            )
            out = derive._new_block_rows()
            derive._emit_block(out, gadm, ring)
            return derive._block_rows_table(out)

    import ray

    streets = ray.data.from_arrow(derive.streets_table())
    blocks = derive.extract_blocks(streets, extraction_method="whole_cell")
    parts = [ray.get(r) for r in blocks.to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if p.num_rows])
    # one block per gadm cell, same schema as the built-in methods
    assert t.num_rows == (world.N_BLOCKS // 10) ** 2
    assert set(t.column_names) == set(derive._BLOCK_COLS)
    # unknown method fails with the name list, not silently
    with pytest.raises(KeyError, match="face_trace"):
        derive.extract_blocks(streets, extraction_method="not_a_method")


def test_doc_stage_compose_annotates_in_order(ray_session):
    import ray.data

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["the cat sat", "call 555-123-4567 now"]),
            "source": pa.array(["a.com", "b.com"]),
        }
    )
    out = compose_stages(
        ray.data.from_arrow(docs), ["token_counts", "quality_score", "redact_pii"]
    ).to_pandas()
    # input columns survive, every stage's features appended
    for col in ("doc_id", "text", "source", "n_ws_tokens", "n_words",
                "quality_bucket", "clean_text", "n_redactions"):
        assert col in out.columns, col
    assert out.loc[out.doc_id == 2, "n_redactions"].iloc[0] >= 1
    assert "555-123-4567" not in out.loc[out.doc_id == 2, "clean_text"].iloc[0]
    with pytest.raises(KeyError, match="registered:"):
        compose_stages(ray.data.from_arrow(docs), ["no_such_stage"])
    assert "token_counts" in DOC_STAGES.names()


def test_annotator_column_collision_is_loud():
    """A stage whose output column already exists must raise — the old
    silent skip kept the EXISTING column and dropped the stage output
    (un-annotated data with no error)."""
    import pyarrow as pa

    from prclz_ray.registry import DOC_STAGES

    b = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["email a@b.com"]),
            "clean_text": pa.array(["already here"]),
        }
    )
    with pytest.raises(ValueError, match="clean_text.*already exists"):
        DOC_STAGES["redact_pii"](b)
