from datacurator_jl_spark.plans.stages import ModelStage, StagePlanner

__all__ = ["ModelStage", "StagePlanner"]
