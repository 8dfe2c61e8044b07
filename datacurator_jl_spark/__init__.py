"""datacurator_jl_spark — a PySpark-native, recipe-driven validate-and-
transform engine with the query semantics of bencardoen/DataCurator.jl,
specialized as a web-text quality-filter pipeline.

The reference (read-only at /root/reference, studied for WHAT it computes,
not HOW) compiles a TOML recipe into an ordered list of
(condition, action[, counteraction]) rules applied to every node of a
dataset graph (reference: src/DataCurator.jl:4170-4176 make_tuple,
:1516-1568 dostep). Here the dataset is a Spark DataFrame of documents,
every rule is a vectorized Column expression (or, for model stages, an
Arrow-batched mapInPandas stage), and the whole recipe compiles to ONE
declarative plan Catalyst can optimize: predicate pushdown, short-circuit
CASE WHEN ordering, whole-stage codegen.

Layout:
- recipe.py      TOML recipe -> validated RecipeSpec IR (eager validation,
                 reference src/DataCurator.jl:2911-2948, 3372-3466)
- registry.py    rule-name -> Column-factory registry (reference `lookup`,
                 src/DataCurator.jl:3537-3564)
- engine.py      RecipeSpec -> compiled pipeline: decision struct column
                 (kept, rule_id), transforms, counters, sinks
- functions/     text heuristics, langid, scrub, predicates, transforms
- operators/     buildcomp table predicates, dataframe ops, mode band-pass,
                 dedup suite, similarity search, skew handling
- sources/       table loading + lineage columns
- plans/         stage planner (cheap->expensive UDF ordering)
- streaming/     Structured Streaming wrappers
- multimodal/    binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"

from datacurator_jl_spark.recipe import RecipeSpec, Rule, load_recipe, parse_recipe
from datacurator_jl_spark.engine import Pipeline, compile_recipe

__all__ = [
    "RecipeSpec",
    "Rule",
    "load_recipe",
    "parse_recipe",
    "Pipeline",
    "compile_recipe",
    "__version__",
]
