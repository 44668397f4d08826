"""Extension surface (SURVEY §2.10): named plugin registries.

The reference exposes block extraction as a pluggable ABC with a
module-level default (``BlockExtractionMethod`` /
``DEFAULT_EXTRACTION_METHOD``, `prclz/blocks/methods.py:11-14`, `:109`)
threaded through ``extract_blocks(extraction_method=...)``
(`prclz/blocks/extraction.py:30-36`). The engine equivalent is a
``Registry`` of named callables per extension point — a user registers
a new implementation under a name and runs the SAME pipeline:

    from prclz_ray.registry import Registry
    from prclz_ray.pipelines.derive import EXTRACTION_METHODS, extract_blocks

    @EXTRACTION_METHODS.register("my_method")
    def my_method(group: pa.Table) -> pa.Table: ...

    blocks = extract_blocks(streets_ds, extraction_method="my_method")

Two registries ship:

- ``EXTRACTION_METHODS`` (instantiated in ``pipelines/derive.py``):
  per-gadm street group → block rows, the ``map_groups`` signature
  ``pa.Table -> pa.Table``.
- ``DOC_STAGES`` (below): per-batch document ANNOTATORS — each takes a
  document batch and returns it with appended columns, so any sequence
  composes. ``compose_stages`` chains them over a Dataset; the CLI
  ``compose`` subcommand is the user-facing surface.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pyarrow as pa


class Registry:
    """A named table of plugin callables (one per extension point).

    ``register`` doubles as a decorator. Duplicate names raise unless
    ``replace=True`` — silent shadowing of a built-in is how config
    bugs hide. Lookup errors list the registered names."""

    def __init__(self, kind: str):
        self.kind = kind
        self._fns: dict[str, Callable] = {}

    def register(self, name: str, fn: Callable | None = None, *, replace: bool = False):
        if not isinstance(name, str):
            # @REG.register (bare, no name) would otherwise bind name=fn
            # and silently register nothing — fail loudly at def time
            raise TypeError(
                f"{self.kind} register() needs a name string first; "
                "use @registry.register('my_name')"
            )
        if fn is None:
            def deco(f: Callable) -> Callable:
                self.register(name, f, replace=replace)
                return f

            return deco
        if name in self._fns and not replace:
            raise ValueError(
                f"{self.kind} {name!r} is already registered; "
                f"pass replace=True to override"
            )
        self._fns[name] = fn
        return fn

    def __getitem__(self, name: str) -> Callable:
        try:
            return self._fns[name]
        except KeyError:
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: {sorted(self._fns)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._fns

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._fns))

    def names(self) -> list[str]:
        return sorted(self._fns)


# ---------------------------------------------------------------------------
# document annotator stages — the composable per-batch extension point

DOC_STAGES = Registry("document stage")


def _annotator(compute: Callable[[pa.Table], pa.Table]) -> Callable[[pa.Table], pa.Table]:
    """Lift a (doc_id, ...) feature kernel into an ANNOTATOR: the batch
    passes through with the kernel's non-doc_id columns appended (row
    order is preserved by every kernel, so this is a positional concat,
    not a join)."""

    def annotate(batch: pa.Table) -> pa.Table:
        feats = compute(batch)
        out = batch
        for name in feats.column_names:
            if name == "doc_id":
                continue  # the key echo every kernel emits
            if name in out.column_names:
                # a silent skip here would leave the EXISTING column in
                # place and drop the stage's output — un-annotated data
                # with no error (e.g. redact_pii over a table that
                # already has clean_text). Loud beats wrong.
                raise ValueError(
                    f"stage output column {name!r} already exists in the "
                    "batch; rename the input column or the stage output"
                )
            out = out.append_column(name, feats.column(name))
        return out

    return annotate


def _register_builtin_stages() -> None:
    from .stages import textops

    DOC_STAGES.register("token_counts", _annotator(textops.token_counts))
    DOC_STAGES.register("quality_score", _annotator(textops.quality_score))
    DOC_STAGES.register("lang_id", _annotator(textops.lang_id))
    DOC_STAGES.register("fingerprint", _annotator(textops.fingerprint))
    DOC_STAGES.register("redact_pii", _annotator(textops.redact_pii))


_register_builtin_stages()


def compose_stages(ds, stage_names: list[str]):
    """Chain registered document stages over a Dataset — one fused
    map_batches per stage (Ray fuses adjacent task-pool maps, so the
    chain costs one pass over the corpus regardless of length)."""
    for name in stage_names:
        ds = ds.map_batches(DOC_STAGES[name], batch_format="pyarrow")
    return ds
