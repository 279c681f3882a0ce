#!/bin/bash
# End-to-end demo over one scanned object (equivalent role to the
# reference's scripts/demo_pipeline.sh): parse the capture, build the SfM
# model, run demo inference with detection + box rendering.
#
# Usage: bash scripts/demo_pipeline.sh <obj_name> [--WITH_TRACKING]
#   expects data/demo/<obj_name>/ with <obj>-annotate/ and <obj>-test/
set -e

OBJ_NAME=$1
if [ -z "$OBJ_NAME" ]; then
    echo "usage: bash scripts/demo_pipeline.sh <obj_name> [--WITH_TRACKING]"
    exit 1
fi

DATA_ROOT="data/demo/${OBJ_NAME}"
TRACKING=False
if [ "$2" == "--WITH_TRACKING" ]; then
    TRACKING=True
fi

echo "=> parse scanned data"
python parse_scanned_data.py --scanned_object_path "${DATA_ROOT}"

echo "=> SfM mapping"
cat > /tmp/demo_sfm_list.txt <<EOF
${OBJ_NAME} ${OBJ_NAME}-annotate
EOF
python run.py +preprocess=sfm_spp_spg_demo \
    "dataset.data_list=/tmp/demo_sfm_list.txt" \
    "scan_data_dir=$(dirname "$(pwd)/${DATA_ROOT}")"

echo "=> demo inference"
python inference_demo.py +experiment=test_demo \
    "data_root=$(pwd)/${DATA_ROOT}" \
    "data_seq=${OBJ_NAME}-test" \
    "use_tracking=${TRACKING}"
