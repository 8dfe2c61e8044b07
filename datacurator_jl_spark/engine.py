"""Recipe execution engine: RecipeSpec -> one declarative Spark plan.

Semantics reproduced from the reference (and pinned in SURVEY.md §7.1):

- Rules evaluate IN ORDER per document; each rule fires its action when
  ``condition == act_on_success``, else its counteraction (``dostep``,
  reference src/DataCurator.jl:1516-1568). A null condition (null text
  etc.) counts as a failed condition.
- A fired **drop** is terminal for that document: later rules see it as
  gone (the per-document early-exit reading of ``:quit`` /
  counteraction, src/DataCurator.jl:3644-3657, 4121-4130).
- ``dc_rule_id`` = the rule that decided the document: the first fired
  drop, else the first fired explicit keep, else ``"default_keep"``.
- Transforms fire left-to-right, composing (``collapse_functions``,
  src/DataCurator.jl:1919-1924), and only while the document is alive.
- Counters / file-list tags accumulate only while alive
  (src/DataCurator.jl:3856-3889, 3613-3630).

All of this lowers to ONE ``select`` over the input: an ordered
``CASE WHEN`` chain per output. First-match-wins over pure predicates is
exactly sequential evaluation, so the vectorized plan is label-identical
to the reference's per-node loop (SURVEY.md §7.4 point 3). Catalyst
short-circuits the AND/CASE chains, giving the reference's documented
cheap-first win (docs/src/recipe.md:497-499) natively.

Scale posture: zero shuffles in the rule pass itself — it is a pure
narrow projection, whole-stage-codegen'd. Counters/lineage are one
hash aggregate over the already-computed tag columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacurator_jl_spark.recipe import RecipeSpec, Rule
from datacurator_jl_spark.registry import (
    ActionSpec,
    RuleContext,
    compile_action,
    compile_condition,
    compile_metric,
)

KEPT_COL = "dc_kept"
RULE_COL = "dc_rule_id"
QUIT_COL = "dc_quit"
SCRUBBED_COL = "scrubbed_text"
_CNT = "_dc_cnt_"
_LST = "_dc_lst_"
DEFAULT_RULE_ID = "default_keep"


@dataclass
class _CompiledRule:
    rule_id: str
    fired: Column  # action branch taken
    drop_fire: Column
    keep_fire: Column
    quit_fire: Column
    transforms: list[tuple[str, Any, Column]]  # (target_col, fn, gate)
    counts: list[tuple[str, Column]]  # (name, gate)
    lists: list[tuple[str, Column]]  # (name, gate)


def _branch_col(fired: Column, in_action: bool, in_counter: bool) -> Column:
    if in_action and in_counter:
        return F.lit(True)
    if in_action:
        return fired
    if in_counter:
        return ~fired
    return F.lit(False)


def _compile_rule(rule: Rule, ctx: RuleContext, act_on_success: bool) -> _CompiledRule:
    cond = compile_condition(rule.condition, ctx)
    fired = F.coalesce(cond, F.lit(False)) == F.lit(act_on_success)
    a_effects = compile_action(rule.action, ctx)
    c_effects = compile_action(rule.counteraction, ctx) if rule.counteraction else []

    def has(kind: str, effects: list[ActionSpec]) -> bool:
        return any(e.kind == kind for e in effects)

    transforms: list[tuple[str, Any, Column]] = []
    counts: list[tuple[str, Column]] = []
    lists: list[tuple[str, Column]] = []
    for effects, gate in ((a_effects, fired), (c_effects, ~fired)):
        for e in effects:
            if e.kind == "transform":
                transforms.append((e.target_col, e.transform, gate))
            elif e.kind == "count":
                counts.append((e.name, gate))
            elif e.kind == "list":
                lists.append((e.name, gate))

    return _CompiledRule(
        rule_id=rule.rule_id,
        fired=fired,
        drop_fire=_branch_col(fired, has("drop", a_effects), has("drop", c_effects)),
        keep_fire=_branch_col(fired, has("keep", a_effects), has("keep", c_effects)),
        quit_fire=_branch_col(fired, has("quit", a_effects), has("quit", c_effects)),
        transforms=transforms,
        counts=counts,
        lists=lists,
    )


@dataclass
class _LevelPlan:
    kept: Column
    rule_id: Column
    quit: Column
    out_cols: dict[str, Column]  # transformed target col -> final expr
    cnt: dict[str, Column]
    lst: dict[str, Column]


def _fold_rules(compiled: list[_CompiledRule], ctx: RuleContext, spec: RecipeSpec) -> _LevelPlan:
    alive = F.lit(True)
    cur: dict[str, Column] = {}
    drop_chain: Column | None = None
    keep_chain: Column | None = None
    quit_any = F.lit(False)
    cnt: dict[str, Column] = {n: F.lit(0).cast("long") for n in spec.counters}
    lst: dict[str, Column] = {n: F.lit(False) for n in spec.file_lists}

    for cr in compiled:
        eff_drop = alive & cr.drop_fire
        eff_keep = alive & cr.keep_fire
        step_d = F.when(eff_drop, F.lit(cr.rule_id))
        drop_chain = step_d if drop_chain is None else F.coalesce(drop_chain, step_d)
        step_k = F.when(eff_keep, F.lit(cr.rule_id))
        keep_chain = step_k if keep_chain is None else F.coalesce(keep_chain, step_k)
        quit_any = quit_any | (alive & cr.quit_fire)
        for tcol, fn, gate in cr.transforms:
            base = cur.get(tcol, F.col(tcol))
            cur[tcol] = F.when(alive & gate, fn(base)).otherwise(base)
        for name, gate in cr.counts:
            if name not in cnt:
                cnt[name] = F.lit(0).cast("long")
            inc = compile_metric(spec.counters.get(name), ctx)
            cnt[name] = cnt[name] + F.when(alive & gate, inc).otherwise(F.lit(0))
        for name, gate in cr.lists:
            if name not in lst:
                lst[name] = F.lit(False)
            lst[name] = lst[name] | (alive & gate)
        alive = alive & ~cr.drop_fire

    rid = F.coalesce(
        *(c for c in (drop_chain, keep_chain) if c is not None),
        F.lit(DEFAULT_RULE_ID),
    )
    return _LevelPlan(kept=alive, rule_id=rid, quit=quit_any, out_cols=cur, cnt=cnt, lst=lst)


class CurationResult:
    """Annotated DataFrame + metric/sink accessors.

    ``df`` carries every input column plus dc_kept / dc_rule_id / dc_quit,
    ``scrubbed_text`` (null for dropped docs, per FIXTURES.md §2), any
    other transformed columns as ``<col>_out``, and internal tag columns
    for counters/file lists.
    """

    def __init__(self, df: DataFrame, spec: RecipeSpec, ctx: RuleContext):
        self.df = df
        self.spec = spec
        self.ctx = ctx

    def _clean(self, df: DataFrame) -> DataFrame:
        drop = [c for c in df.columns if c.startswith(_CNT) or c.startswith(_LST)]
        return df.drop(*drop, QUIT_COL)

    def kept(self) -> DataFrame:
        return self._clean(self.df.filter(F.col(KEPT_COL))).drop(KEPT_COL)

    def dropped(self) -> DataFrame:
        """Drop-log: (name, rule_id) of every document removed — the
        reference's log_to_file counteraction sink
        (src/DataCurator.jl:3270-3276)."""
        return (
            self.df.filter(~F.col(KEPT_COL))
            .select(F.col(self.ctx.name_col), F.col(RULE_COL))
        )

    def counters(self) -> DataFrame:
        """(name, count) — the CLI's counters.csv shape
        (reference scripts/curator.jl:117-134)."""
        names = sorted(
            c[len(_CNT):] for c in self.df.columns if c.startswith(_CNT)
        )
        if not names:
            return self.df.sparkSession.createDataFrame([], "name string, count long")
        aggs = [F.sum(F.col(_CNT + n)).alias(n) for n in names]
        wide = self.df.agg(*aggs)
        stack = ", ".join(f"'{n}', `{n}`" for n in names)
        return wide.selectExpr(
            f"stack({len(names)}, {stack}) as (name, count)"
        )

    def file_list(self, name: str) -> DataFrame:
        """Rows tagged into a named file list (reference add_to_file_list,
        src/DataCurator.jl:3617-3630); projection/aggregation of the
        list's sink spec is applied by `write_file_lists`."""
        col = _LST + name
        if col not in self.df.columns:
            raise KeyError(f"no file list {name!r}")
        return self._clean(self.df.filter(F.col(col)))

    def lineage(self) -> DataFrame:
        """Per-partition lineage/metrics: (partition_id, rule_id, kept,
        dropped, bytes) — the north rule's per-partition counters. One
        hash aggregate; partial aggregation keeps it cheap at scale."""
        return (
            self.df.groupBy(
                F.spark_partition_id().alias("partition_id"),
                F.col(RULE_COL).alias("rule_id"),
            )
            .agg(
                F.sum(F.col(KEPT_COL).cast("long")).alias("kept"),
                F.sum((~F.col(KEPT_COL)).cast("long")).alias("dropped"),
                F.sum(
                    F.octet_length(F.coalesce(F.col(self.ctx.text_col), F.lit("")))
                ).alias("bytes"),
            )
        )

    def quit_requested(self) -> bool:
        """Global early-exit gate (reference :quit / halt,
        src/DataCurator.jl:3205-3206): cheap LIMIT-1 pre-pass instead of
        a row-level global abort (SURVEY.md §2.1 early-exit note)."""
        return bool(self.df.filter(F.col(QUIT_COL)).limit(1).count() > 0)


class Pipeline:
    """Compiled recipe. ``apply(df)`` adds decision/transform columns."""

    def __init__(self, spec: RecipeSpec):
        self.spec = spec

    def _ctx(self, df: DataFrame) -> RuleContext:
        return RuleContext(
            name_col=self.spec.name_col,
            text_col=self.spec.text_col,
            html_col=self.spec.html_col if (self.spec.html_col in df.columns) else None,
            available_cols=df.columns,
            spec=self.spec,
        )

    def apply(self, df: DataFrame) -> CurationResult:
        spec = self.spec
        ctx = self._ctx(df)
        plans: dict[int, _LevelPlan] = {}
        for lvl, rules in spec.levels.items():
            compiled = [_compile_rule(r, ctx, spec.act_on_success) for r in rules]
            plans[lvl] = _fold_rules(compiled, ctx, spec)

        if not spec.hierarchical or set(plans) == {-1}:
            plan = plans[-1]
        else:
            plan = self._merge_levels(plans, spec)

        out = dict.fromkeys(df.columns)  # preserve order
        cols: list[Column] = [F.col(c) for c in out]
        cols.append(plan.kept.alias(KEPT_COL))
        cols.append(plan.rule_id.alias(RULE_COL))
        cols.append(plan.quit.alias(QUIT_COL))
        text_expr = plan.out_cols.get(spec.text_col, F.col(spec.text_col))
        cols.append(
            F.when(plan.kept, text_expr).otherwise(F.lit(None)).alias(SCRUBBED_COL)
        )
        for tcol, expr in plan.out_cols.items():
            if tcol != spec.text_col:
                cols.append(expr.alias(f"{tcol}_out"))
        for name, expr in plan.cnt.items():
            cols.append(expr.alias(_CNT + name))
        for name, expr in plan.lst.items():
            cols.append(expr.alias(_LST + name))
        return CurationResult(df.select(*cols), spec, ctx)

    def _merge_levels(self, plans: dict[int, _LevelPlan], spec: RecipeSpec) -> _LevelPlan:
        """Hierarchical dispatch: rules keyed by the per-row level column,
        -1 as default (reference verifier Dict form,
        src/DataCurator.jl:4194-4218)."""
        lvl_col = F.col(spec.level_col)
        default = plans.get(-1)
        keyed = sorted((k, v) for k, v in plans.items() if k != -1)

        def merge(get, dflt):
            expr = get(default) if default is not None else dflt
            for k, p in reversed(keyed):
                expr = F.when(lvl_col == k, get(p)).otherwise(expr)
            return expr

        all_out = {c for p in plans.values() for c in p.out_cols}
        all_cnt = {c for p in plans.values() for c in p.cnt}
        all_lst = {c for p in plans.values() for c in p.lst}
        return _LevelPlan(
            kept=merge(lambda p: p.kept, F.lit(True)),
            rule_id=merge(lambda p: p.rule_id, F.lit(DEFAULT_RULE_ID)),
            quit=merge(lambda p: p.quit, F.lit(False)),
            out_cols={
                c: merge(lambda p, c=c: p.out_cols.get(c, F.col(c)), F.col(c))
                for c in all_out
            },
            cnt={
                c: merge(lambda p, c=c: p.cnt.get(c, F.lit(0).cast("long")), F.lit(0).cast("long"))
                for c in all_cnt
            },
            lst={
                c: merge(lambda p, c=c: p.lst.get(c, F.lit(False)), F.lit(False))
                for c in all_lst
            },
        )


def compile_recipe(spec: RecipeSpec) -> Pipeline:
    return Pipeline(spec)


def run_recipe(df: DataFrame, spec: RecipeSpec) -> CurationResult:
    return Pipeline(spec).apply(df)
