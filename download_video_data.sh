#!/bin/bash
# Download the video benchmark data (animations / simulations / teaser
# H5 folders) used by render-videos.sh — parity with the reference
# download_video_data.sh. Requires network access.
set -e
OUT=${1:-video_data}
echo "Video benchmark data is distributed with the upstream RenderFormer"
echo "release (see that project's README). Place the extracted folders"
echo "under: $OUT/<sequence_name>/*.h5"
echo "Then render with: ./render-videos.sh $OUT"
