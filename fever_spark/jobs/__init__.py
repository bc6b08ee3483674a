from fever_spark.jobs.sketch_job import SketchJob, run_sketch_job

__all__ = ["SketchJob", "run_sketch_job"]
