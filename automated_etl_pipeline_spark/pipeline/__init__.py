from automated_etl_pipeline_spark.pipeline.runner import Pipeline, Stage, StageResult

__all__ = ["Pipeline", "Stage", "StageResult"]
