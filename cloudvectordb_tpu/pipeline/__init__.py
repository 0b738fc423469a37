"""L6: the pipeline — stage sequencing, resume, CLI (the reference's "script")."""

from cloudvectordb_tpu.pipeline.run import Pipeline, run_pipeline  # noqa: F401
