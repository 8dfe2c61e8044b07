from datacurator_jl_spark.functions import predicates, scrub, text, transforms

__all__ = ["predicates", "scrub", "text", "transforms"]
