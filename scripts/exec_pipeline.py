#!/usr/bin/env python
"""Run the end-to-end pipeline from a YAML config.

Parity with reference ``PipelineExecution/exec_pipeline.py`` and its config
schema (``pipeline_config.yaml``). See ``configs/pipeline_config.yaml`` for
a template.
"""

import argparse
import logging
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        type=str,
        default=os.path.join("configs", "pipeline_config.yaml"),
    )
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    from treemorph_tpu.pipeline import run_pipeline

    results = run_pipeline(cfg)
    for r in results:
        print(
            f"{os.path.basename(r['cloud'])}: {r['points']} pts, "
            f"{r['cylinders']} cylinders, {r['seconds']:.1f}s"
        )


if __name__ == "__main__":
    main()
