#!/bin/bash
# Render folders of per-frame H5 scenes into videos (parity with the
# reference render-videos.sh batch_infer workload).
set -e
H5_ROOT=${1:-video_data}
OUT=${2:-outputs/videos}
MODEL=${3:-v1-base}
PAD=${4:-4096}
for dir in "$H5_ROOT"/*/; do
    name=$(basename "$dir")
    python batch_infer.py --h5_folder "$dir" --model_id "$MODEL" \
        --batch_size 8 --padding_length "$PAD" \
        --output_dir "$OUT/$name" --tone_mapper agx
done
