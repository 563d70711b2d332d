#!/usr/bin/env python
"""Offline preprocessing CLI: windowed CTR-rate features + down-sampling.

Local mode runs anywhere (no Spark); --engine spark submits the PySpark
driver for HDFS-scale data (reference python/spark/data_process.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wide_deep_tpu.config import Config
    config = Config(os.environ.get("WIDE_DEEP_CONF_DIR"))
    conf = config.data_process
    p = argparse.ArgumentParser(description="offline data preprocessing")
    p.add_argument("--engine", choices=["local", "spark"], default="local")
    p.add_argument("--input_dir", default=conf["input_hdfs_dir"])
    p.add_argument("--output_dir", default=conf["output_hdfs_dir"])
    p.add_argument("--start_date", default=str(conf["start_date"]))
    p.add_argument("--end_date", default=str(conf["end_date"]))
    p.add_argument("--keep_ratio", type=float,
                   default=conf["downsampling_keep_ratio"])
    p.add_argument("--feature_index", type=int, nargs="*",
                   default=conf["category_feature_index_list"])
    args = p.parse_args()

    from wide_deep_tpu.offline import ctr_features as cf
    dates = cf.list_dates(args.start_date, args.end_date)
    if args.engine == "spark":
        from wide_deep_tpu.offline import spark_job
        for date in dates:
            inpath = [os.path.join(args.input_dir, d)
                      for d in cf.gen_dates(date, 30)]
            spark_job.hdfs_data_preprocess(
                inpath, os.path.join(args.output_dir, date),
                args.feature_index, args.keep_ratio)
    else:
        from wide_deep_tpu.offline.local_job import local_data_preprocess
        for date in dates:
            n = local_data_preprocess(args.input_dir, args.output_dir, date,
                                      args.feature_index, args.keep_ratio)
            print(f"{date}: wrote {n} rows")


if __name__ == "__main__":
    main()
