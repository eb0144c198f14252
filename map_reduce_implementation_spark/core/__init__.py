from .mapreduce import MapReduceResult, MapReduceSpec, run_mapreduce

__all__ = ["MapReduceSpec", "MapReduceResult", "run_mapreduce"]
