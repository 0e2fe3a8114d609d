#!/bin/bash
# Render all example scene H5s to images (parity with the reference
# render-images.sh): convert JSON -> H5 where needed, then infer.
set -e
EXAMPLES=${1:-examples}
OUT=${2:-outputs/images}
MODEL=${3:-v1-base}
mkdir -p "$OUT"
for json in "$EXAMPLES"/*.json; do
    name=$(basename "$json" .json)
    h5="$OUT/$name.h5"
    python -m renderformer_tpu.scene.convert_scene "$json" "$h5"
    python infer.py --h5_file "$h5" --model_id "$MODEL" --output_dir "$OUT" --tone_mapper agx
done
