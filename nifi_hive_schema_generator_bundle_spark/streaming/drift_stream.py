"""Continuous per-group schema-drift monitoring.

The batch ``operators.drift.schema_drift_report`` answers "how do my
sources differ right now"; this is its streaming twin: per micro-batch,
fold each group's records into a driver-held schema (the keyed
zero-shuffle lattice fold of ``infer_schema_by_key``) and emit an event
whenever a group gains a field, loses parity, or demotes a type — the
signal a 100 TB ingest pipeline alerts on before a bad producer poisons
a day of data.

State is schema trees only (tiny, driver-held), exactly like
``infer_stream.InferenceState`` — no Spark stateful operator needed;
watermarks are irrelevant because schema merge is monotone (late data
can only widen a schema, never retract it).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DataType, StructType

from ..operators.infer import infer_schema_by_key
from ..plans.lattice import merge_types, type_to_dict

__all__ = ["GroupDriftState"]


def _classes(t: DataType) -> dict[str, str]:
    if not isinstance(t, StructType):
        return {}
    out = {}
    for f in t.fields:
        if isinstance(f.dataType, StructType):
            out[f.name] = "STRUCT"
        elif isinstance(f.dataType, ArrayType):
            out[f.name] = "ARRAY"
        else:
            out[f.name] = "STRING"
    return out


@dataclass
class GroupDriftState:
    """Driver-held per-group schemas + drift-event log.

    Wire ``process_batch`` into ``foreachBatch``; read ``events`` (or
    hook ``on_drift``) for the change feed. Each event is
    ``(batch_id, group, field, change)`` with change ∈
    {'new_group', 'new_field', 'retyped:<old>-><new>'}."""

    json_col: str = "payload"
    key_col: str = "group_key"
    schemas: dict[str, DataType] = field(default_factory=dict)
    events: list[tuple[int, str, str, str]] = field(default_factory=list)
    batches: int = 0
    on_drift: Callable[[int, str, str, str], None] | None = None

    def _emit(self, batch_id: int, group: str, fld: str, change: str) -> None:
        self.events.append((batch_id, group, fld, change))
        if self.on_drift is not None:
            self.on_drift(batch_id, group, fld, change)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches += 1
        batch_schemas = infer_schema_by_key(batch_df, self.json_col, self.key_col)
        for key in sorted(batch_schemas):
            t = batch_schemas[key]
            old = self.schemas.get(key)
            if old is None:
                self.schemas[key] = t
                self._emit(batch_id, key, "*", "new_group")
                continue
            merged = merge_types(old, t)
            if type_to_dict(merged) == type_to_dict(old):
                continue  # batch fits the known schema — no drift
            oldc, newc = _classes(old), _classes(merged)
            for fld in sorted(newc):
                if fld not in oldc:
                    self._emit(batch_id, key, fld, "new_field")
                elif newc[fld] != oldc[fld]:
                    self._emit(
                        batch_id, key, fld, f"retyped:{oldc[fld]}->{newc[fld]}"
                    )
            self.schemas[key] = merged
