#!/bin/bash
# Dump full-resolution frames for the test sequences of each object
# (equivalent role to the reference's scripts/parse_full_img.sh).
# Usage: bash scripts/parse_full_img.sh <scan_data_dir>
set -e

SCAN_DIR=${1:-data/onepose_datasets/test_data}
for obj in "${SCAN_DIR}"/*/; do
    for seq in "${obj}"*/; do
        if [ -f "${seq}/Frames.m4v" ] && [ ! -d "${seq}/color_full" ]; then
            echo "=> ${seq}"
            python video2img.py --input "${seq}/Frames.m4v" \
                --output "${seq}/color_full"
        fi
    done
done
