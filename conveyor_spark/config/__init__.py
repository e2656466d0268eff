from conveyor_spark.config.spec import PipelineSpec, StageSpec, load_spec  # noqa: F401
