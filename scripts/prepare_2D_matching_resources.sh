#!/bin/bash
# Fetch the pretrained SuperPoint / SuperGlue weights used by the
# feature-matching object detector (equivalent role to the reference's
# scripts/prepare_2D_matching_resources.sh). This environment has no
# network egress; place the files manually if offline:
#   data/models/extractors/SuperPoint/superpoint_v1.pth
#   data/models/matchers/SuperGlue/superglue_outdoor.pth
set -e

SP_DIR=data/models/extractors/SuperPoint
SG_DIR=data/models/matchers/SuperGlue
mkdir -p "${SP_DIR}" "${SG_DIR}"

SP_URL="https://github.com/magicleap/SuperPointPretrainedNetwork/raw/master/superpoint_v1.pth"
SG_URL="https://github.com/magicleap/SuperGluePretrainedNetwork/raw/master/models/weights/superglue_outdoor.pth"

fetch() {
    local url=$1 out=$2
    if [ -f "${out}" ]; then
        echo "already present: ${out}"
    elif command -v wget >/dev/null; then
        wget -O "${out}" "${url}"
    elif command -v curl >/dev/null; then
        curl -L -o "${out}" "${url}"
    else
        echo "no downloader available; place ${out} manually (${url})"
    fi
}

fetch "${SP_URL}" "${SP_DIR}/superpoint_v1.pth"
fetch "${SG_URL}" "${SG_DIR}/superglue_outdoor.pth"
