from datacurator_jl_spark.testing.synth import synth_documents_pandas, synth_documents
from datacurator_jl_spark.testing.oracle import oracle_labels

__all__ = ["synth_documents_pandas", "synth_documents", "oracle_labels"]
