"""PySpark driver for offline preprocessing at HDFS/YARN scale.

Reference: /root/reference/python/spark/data_process.py:75-147 — per date:
1/7/30-day windows, per-category-column CTR-rate broadcast join, stratified
negative down-sampling, 2-partition save; the driver loop validates input
paths and clears the output path.  Shares its math with ctr_features.py so
the local driver and tests exercise identical logic without a cluster.
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional

from wide_deep_tpu.config import Config
from wide_deep_tpu.offline import ctr_features as cf


def exist_hdfs_path(path: str) -> bool:
    return subprocess.call(f"hadoop fs -test -e {path}", shell=True) == 0


def hdfs_data_preprocess(inpath: List[str], outpath: str,
                         feature_index_list: List[int],
                         keep_prob: float, seed: int = 0,
                         num_output_partitions: int = 2,
                         master: str = "yarn") -> None:
    """Process one date's window on a Spark cluster."""
    from pyspark import SparkConf, SparkContext

    sc = SparkContext(conf=SparkConf().setMaster(master))
    try:
        window_paths = {1: inpath[:1], 7: inpath[:7], 30: inpath}
        day = sc.textFile(",".join(window_paths[1])).map(
            lambda x: x.strip().split("\t"))

        rate_maps = []
        for window in cf.WINDOWS:
            rdd = sc.textFile(",".join(window_paths[window])).map(
                lambda x: x.strip().split("\t"))
            for idx in feature_index_list:
                pair = (rdd.map(lambda x, i=idx: (x[i - 1], int(x[0])))
                        .mapValues(lambda v: (v, 1))
                        .reduceByKey(lambda a, b: (a[0] + b[0], a[1] + b[1]))
                        .mapValues(lambda v: float(v[0]) / v[1]))
                rate_maps.append((idx, sc.broadcast(pair.collectAsMap())))

        def transform(row, maps=rate_maps):
            resolved = [(idx, b.value) for idx, b in maps]
            return cf.append_rate_columns(row, resolved)

        data = day
        if feature_index_list:
            data = data.map(transform)
        data = data.filter(lambda row: cf.keep_row(row, keep_prob, seed))
        (data.map(lambda row: "\t".join(row))
             .repartition(num_output_partitions)
             .saveAsTextFile(outpath))
    finally:
        sc.stop()


def main(config: Optional[Config] = None) -> None:
    config = config or Config()
    conf = config.data_process
    feature_index_list = conf["category_feature_index_list"]
    keep_prob = conf["downsampling_keep_ratio"]
    start, end = str(conf["start_date"]), str(conf["end_date"])
    dates = cf.list_dates(start, end)

    for date in dates:
        print(f"Start processing date: {date}")
        inpath = [os.path.join(conf["input_hdfs_dir"], d)
                  for d in cf.gen_dates(date, 30)]
        outpath = os.path.join(conf["output_hdfs_dir"], date)
        for p in inpath:
            if not exist_hdfs_path(p):
                raise IOError(f"Hdfs path: {p} not exists")
        if exist_hdfs_path(outpath):
            subprocess.call(f"hadoop fs -rm -r {outpath}", shell=True)
            print(f"Removed hdfs path: {outpath}")
        hdfs_data_preprocess(inpath, outpath, feature_index_list, keep_prob)


if __name__ == "__main__":
    main()
