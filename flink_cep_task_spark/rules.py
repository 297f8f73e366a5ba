"""Rule parsing, validation, and lifecycle compaction.

A *rule* is a query-as-data document: (grouping tags, window spec,
aggregate, threshold). Reference: Rule.java:12-24, wire sample
resources/rules:1, lifecycle handling PartitionEngine.java:54-63.

Design (SURVEY.md §3.2): rules live in a small DataFrame. Instead of the
reference's per-task mutable BroadcastState map, we *compact* the rule
changelog declaratively — last writer (highest seq) wins per rule_id,
DELETE tombstones drop the rule — and broadcast-join the compacted ACTIVE
set against the metric stream each batch. Rule updates therefore take
effect at the next micro-batch boundary, fixing reference quirk Q6 (stale
rule captured per group, CEPEngine.java:55-64).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cep_task_spark.schemas import (
    AGG_TYPES,
    LIMIT_OPS,
    RULE_SCHEMA,
    RULE_STATES,
)


# the reference's wire accepts limit operators as ENUM NAMES — fastjson
# deserializes LimitOperatorType by valueOf, and the reference's own
# sample rule (resources/rules:1) says "GREATER" — while the symbolic
# forms come from LimitOperatorType.fromString (Rule.java:99-107, unused
# by the reference's ingest but part of its declared vocabulary). Both
# parsers accept both and normalize to the symbol.
LIMIT_OP_NAMES = {
    "EQUAL": "=",
    "NOT_EQUAL": "!=",
    "GREATER_EQUAL": ">=",
    "LESS_EQUAL": "<=",
    "GREATER": ">",
    "LESS": "<",
}


@dataclass(frozen=True)
class Rule:
    """Validated engine-internal rule (snake_case mirror of Rule.java:12-24)."""

    rule_id: int
    rule_state: str = "ACTIVE"
    window_type: str = "tumbling"  # tumbling | sliding | anything-else ⇒ global (CEPEngine.java:75-81)
    window_minutes: int | None = None
    window_slide_minutes: int | None = None
    grouping_keys: tuple[str, ...] = field(default_factory=tuple)
    agg_type: str = "SUM"
    agg_field: str = "value"
    limit_op: str = ">"
    limit: str = "0"  # decimal as string to stay exact
    seq: int = 0

    def __post_init__(self) -> None:
        if self.rule_state not in RULE_STATES:
            raise ValueError(f"bad ruleState {self.rule_state!r}")
        if self.rule_state == "DELETE":
            return  # tombstones need only rule_id + state
        if self.agg_type not in AGG_TYPES:
            raise ValueError(f"bad aggregatorFunctionType {self.agg_type!r}")
        if self.limit_op not in LIMIT_OPS:
            raise ValueError(f"bad limitOperatorType {self.limit_op!r}")
        def _pos(v) -> bool:
            return v is not None and v > 0

        if self.window_type == "tumbling" and not _pos(self.window_minutes):
            raise ValueError("tumbling rule requires a positive windowMinutes")
        if self.window_type == "sliding" and not (
            _pos(self.window_minutes) and _pos(self.window_slide_minutes)
        ):
            raise ValueError(
                "sliding rule requires positive windowMinutes and windowSlideMinute"
            )
        # engine extension beyond the reference's three types (CEPEngine.java:
        # 75-81): gap-based session windows; windowMinutes is the inactivity
        # gap. "session" is a first-class windowType on the wire too (the
        # reference never emits the keyword, so reference docs are
        # unaffected); truly-unknown strings still coerce to global.
        if self.window_type == "session" and not _pos(self.window_minutes):
            raise ValueError("session rule requires a positive windowMinutes (the gap)")

    @classmethod
    def from_wire(cls, doc: dict, seq: int = 0) -> "Rule":
        """Parse one reference-format JSON rule document (Rule.java:12-24).

        Lenient like the reference's fastjson parse (CEPTaskRunner.java:54-56):
        groupingKeyNames may be an array or a bare scalar; windowType other
        than tumbling/sliding/session means a global window
        (CEPEngine.java:75-81 — "session" is this engine's extension).
        An explicit "seq" in the doc overrides the caller's (file-based rule
        stores carry it; socket arrival order supplies it otherwise) — kept
        in lockstep with parse_rule_lines_df.

        TYPE discipline is strict and shared with the DataFrame twin
        (pinned by tests/test_rules_fuzz.py): integer fields (ruleId,
        windowMinutes, windowSlideMinute, seq) must be JSON integers, the
        limit must be a finite number (or numeric string) representable
        as DECIMAL(18,4), and groupingKeyNames may not be an object or
        contain nested containers — any violation drops the WHOLE rule,
        like a fastjson type mismatch fails the whole document
        (CEPTaskRunner.java:54-56's parse-error→drop path). One deliberate
        divergence: numeric STRINGS for integer fields ("windowMinutes":
        "5") are dropped, not coerced — both engine parsers agree, and
        the reference never emits them.
        """

        # a non-object JSON value ("5", "[1,2]") is not a rule document —
        # from_json yields null for it in the DataFrame twin (this used
        # to escape as AttributeError, crashing parse_rule_lines)
        if not isinstance(doc, dict):
            raise ValueError(f"rule document must be a JSON object, got {doc!r}")
        # explicit JSON null ≡ absent, matching the DataFrame twin's
        # per-field coalesce defaults
        doc = {k: v for k, v in doc.items() if v is not None}

        def as_str(v) -> str:
            # JSON-ish string form, mirroring from_json's string coercion
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        def req_int(v, name: str, bits: int = 32):
            # the DataFrame twin's wire schema types these INT32 (seq:
            # INT64); an overflowing value nulls the typed parse there and
            # drops the rule, so the same range is enforced here
            if v is None:
                return None
            if isinstance(v, bool) or not isinstance(v, int):
                raise ValueError(f"{name} must be a JSON integer, got {v!r}")
            if not -(2 ** (bits - 1)) <= v < 2 ** (bits - 1):
                raise ValueError(f"{name} {v!r} overflows int{bits}")
            return v

        def gk_elem(e) -> str:
            if isinstance(e, (list, dict)):
                # from_json coerces a container ELEMENT to its compact
                # JSON text ('["a"]'); json.dumps with no spaces matches
                return json.dumps(e, separators=(",", ":"))
            return as_str(e)

        gk_raw = doc.get("groupingKeyNames")
        if gk_raw is None:
            gk: list[str] = []
        elif isinstance(gk_raw, list):
            gk = [gk_elem(e) for e in gk_raw]
        elif isinstance(gk_raw, dict):
            raise ValueError("groupingKeyNames may not be an object")
        else:
            gk = [as_str(gk_raw)]
        wt = doc.get("windowType") or "global"
        if wt not in ("tumbling", "sliding", "session"):
            wt = "global"
        seq = req_int(doc.get("seq", seq), "seq", bits=64)
        lim = doc.get("limit", 0)
        if isinstance(lim, bool) or isinstance(lim, (list, dict)):
            raise ValueError(f"limit must be numeric, got {lim!r}")
        import decimal

        try:
            lim_d = decimal.Decimal(str(lim)).quantize(
                decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
            )
        except decimal.DecimalException as e:
            raise ValueError(f"bad limit {lim!r}") from e
        if abs(lim_d) >= decimal.Decimal(10) ** 14:
            raise ValueError(f"limit {lim!r} out of DECIMAL(18,4) range")
        # field-name alias: the reference's sample rule spells the key
        # "LimitOperatorType" (capital L — fastjson smart-matches it);
        # enum NAMES normalize to their symbols (LIMIT_OP_NAMES)
        op = as_str(
            doc.get("limitOperatorType", doc.get("LimitOperatorType", ">"))
        )
        return cls(
            rule_id=req_int(doc["ruleId"], "ruleId"),
            rule_state=as_str(doc.get("ruleState", "ACTIVE")),
            window_type=wt,
            window_minutes=req_int(doc.get("windowMinutes"), "windowMinutes"),
            window_slide_minutes=req_int(
                doc.get("windowSlideMinute"), "windowSlideMinute"
            ),
            grouping_keys=tuple(gk),
            agg_type=as_str(doc.get("aggregatorFunctionType", "SUM")),
            agg_field=as_str(doc.get("aggregateFieldName", "value")),
            limit_op=LIMIT_OP_NAMES.get(op, op),
            limit=str(lim_d),
            seq=seq,
        )

    def as_row(self) -> tuple:
        from decimal import Decimal

        return (
            self.rule_id,
            self.rule_state,
            self.window_type,
            self.window_minutes,
            self.window_slide_minutes,
            list(self.grouping_keys),
            self.agg_type,
            self.agg_field,
            self.limit_op,
            Decimal(self.limit),
            self.seq,
        )


def compact_rule_list(rules: list["Rule"]) -> list["Rule"]:
    """Python mirror of compact_rules (the DataFrame twin): last seq wins
    per rule_id, then ACTIVE only (DELETE tombstones and PAUSEd rules
    drop). The ONE implementation every driver-side consumer shares —
    the oracle generator, plan-shape routing, and window-spec grouping
    must stay in lockstep with the in-plan compaction, and five
    hand-rolled copies of this loop once drifted one semantic apart."""
    latest: dict[int, Rule] = {}
    for r in sorted(rules, key=lambda r: r.seq):
        latest[r.rule_id] = r
    return [r for r in latest.values() if r.rule_state == "ACTIVE"]


def parse_rule_lines(lines: list[str]) -> list[Rule]:
    """Parse JSON-lines rule documents; bad lines are dropped like the
    reference's parse-error→null→filter path (CEPTaskRunner.java:54-56,40)."""
    out: list[Rule] = []
    for i, line in enumerate(lines):
        line = line.strip()
        if not line:
            continue
        try:
            out.append(Rule.from_wire(json.loads(line), seq=i))
        except (ValueError, KeyError, TypeError, json.JSONDecodeError):
            continue
    return out


def rules_df(spark: SparkSession, rules: list[Rule]) -> DataFrame:
    """Materialize rules as the internal rule-table DataFrame."""
    return spark.createDataFrame([r.as_row() for r in rules], RULE_SCHEMA)


def parse_rule_lines_df(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """DataFrame-native wire-format rule parse (P3/P4) — the engine-side
    twin of ``parse_rule_lines`` for rule streams/tables that live in files.

    Mirrors the reference's lenient fastjson parse (CEPTaskRunner.java:54-56,
    Rule.java:12-24) entirely with built-in expressions:
      * limitOperatorType arrives as a symbol (">", "<=", …) and is kept
        symbolic (LimitOperatorType.fromString, Rule.java:99-107);
        unknown symbols drop the rule.
      * groupingKeyNames may be a JSON array OR a bare string — parsed
        twice (array + string) and coalesced.
      * windowType other than tumbling/sliding/session ⇒ global
        (CEPEngine.java:75-81; "session" is this engine's extension).
      * a bad line/doc ⇒ null ⇒ filtered (parse-error→null→filter,
        CEPTaskRunner.java:40), including structurally-invalid rules
        (tumbling without windowMinutes etc. — Rule.__post_init__ twins).
      * TYPE discipline in lockstep with Rule.from_wire (pinned by
        tests/test_rules_fuzz.py): a field that is PRESENT on the wire
        but fails its typed parse (limit "abc", windowMinutes 2.5, seq
        "4", groupingKeyNames as an object) drops the WHOLE rule — a
        second all-strings parse distinguishes present-but-malformed
        from absent, mirroring fastjson's whole-document type failure.

    Output: internal RULE_SCHEMA columns, ready for compact_rules.
    """
    from flink_cep_task_spark.schemas import RULE_WIRE_SCHEMA

    v = F.col(value_col)
    parsed = lines.select(
        F.from_json(v, RULE_WIRE_SCHEMA).alias("r"),
        # raw all-strings parse: per-field "was it present on the wire?"
        # (and the bare-string groupingKeyNames fallback). from_json into
        # string fields keeps the literal text of any scalar, '['/'{'
        # prefixed text for containers.
        F.from_json(
            v,
            "struct<groupingKeyNames:string, windowMinutes:string,"
            " windowSlideMinute:string, `limit`:string, seq:string,"
            " LimitOperatorType:string>",
        ).alias("raw"),
    )
    r = F.col("r")
    raw = F.col("raw")
    state = F.coalesce(r["ruleState"], F.lit("ACTIVE"))
    wt_raw = r["windowType"]
    wt = F.when(
        wt_raw.isin("tumbling", "sliding", "session"), wt_raw
    ).otherwise(F.lit("global"))
    gk_str = raw["groupingKeyNames"]
    # bare-scalar fallback only for true scalars: container-shaped raw
    # text ('['-prefixed failed arrays can't happen — the typed parse
    # coerces array elements — but '{'-prefixed objects can) is malformed
    gk_is_object = gk_str.isNotNull() & gk_str.startswith("{")
    gk = F.coalesce(
        r["groupingKeyNames"],
        F.when(gk_str.isNotNull() & ~gk_is_object, F.array(gk_str)),
        F.array().cast("array<string>"),
    )
    agg_type = F.coalesce(r["aggregatorFunctionType"], F.lit("SUM"))
    # capital-L field alias (reference resources/rules:1) + enum-name →
    # symbol normalization, in lockstep with Rule.from_wire
    op_raw = F.coalesce(
        r["limitOperatorType"], raw["LimitOperatorType"], F.lit(">")
    )
    limit_op = op_raw
    for name, sym in LIMIT_OP_NAMES.items():
        limit_op = F.when(op_raw == name, F.lit(sym)).otherwise(limit_op)
    is_delete = state == "DELETE"
    out = parsed.select(
        r["ruleId"].alias("rule_id"),
        state.alias("rule_state"),
        wt.alias("window_type"),
        r["windowMinutes"].alias("window_minutes"),
        r["windowSlideMinute"].alias("window_slide_minutes"),
        gk.alias("grouping_keys"),
        agg_type.alias("agg_type"),
        F.coalesce(r["aggregateFieldName"], F.lit("value")).alias("agg_field"),
        limit_op.alias("limit_op"),
        F.coalesce(r["limit"], F.lit(0).cast("decimal(18,4)")).alias("limit"),
        F.coalesce(r["seq"], F.lit(0).cast("long")).alias("seq"),
        is_delete.alias("__del"),
        # present-but-malformed detection: raw text exists, typed parse
        # nulled out (or, for groupingKeyNames, the raw is an object) —
        # fastjson fails the whole doc on a field type mismatch, so we
        # drop the rule rather than coalescing a default over the value
        (
            (raw["limit"].isNotNull() & r["limit"].isNull())
            | (raw["windowMinutes"].isNotNull() & r["windowMinutes"].isNull())
            | (
                raw["windowSlideMinute"].isNotNull()
                & r["windowSlideMinute"].isNull()
            )
            | (raw["seq"].isNotNull() & r["seq"].isNull())
            | (gk_is_object & r["groupingKeyNames"].isNull())
        ).alias("__malformed"),
    )
    valid = (
        F.col("rule_id").isNotNull()
        & ~F.col("__malformed")
        & F.col("rule_state").isin(*RULE_STATES)
        & (
            F.col("__del")
            | (
                F.col("agg_type").isin(*AGG_TYPES)
                & F.col("limit_op").isin(*LIMIT_OPS)
                & (
                    # strictly-positive windows, in LOCKSTEP with
                    # Rule.__post_init__ (a falsy/negative size is a
                    # droppable bad doc, and `> 0` is null-safe false —
                    # NULL never passes)
                    (F.col("window_type") == "global")
                    | (
                        (F.col("window_type") == "tumbling")
                        & (F.col("window_minutes") > 0)
                    )
                    | (
                        (F.col("window_type") == "sliding")
                        & (F.col("window_minutes") > 0)
                        & (F.col("window_slide_minutes") > 0)
                    )
                    | (
                        (F.col("window_type") == "session")
                        & (F.col("window_minutes") > 0)
                    )
                )
            )
        )
    )
    return out.filter(valid).drop("__del", "__malformed")


def compact_rules(changelog: DataFrame) -> DataFrame:
    """Last-writer-wins compaction of a rule changelog, dropping DELETEs.

    Replaces BroadcastState upsert/remove (PartitionEngine.java:54-63):
    for each rule_id keep the highest-seq version; a DELETE tombstone
    removes the rule entirely. Pure DataFrame ops — at scale this is a tiny
    aggregation over the (small) rule table, never a bottleneck.
    """
    w = Window.partitionBy("rule_id").orderBy(F.col("seq").desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(F.col("rule_state") != "DELETE")
    )


def active_rules(compacted: DataFrame) -> DataFrame:
    """ACTIVE rules only — PAUSE rules stop matching (Rule.java:63-66)."""
    return compacted.filter(F.col("rule_state") == "ACTIVE")
