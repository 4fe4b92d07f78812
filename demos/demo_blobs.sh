#!/bin/bash
# Reference demos/demo_blobs.bat + gpuhess_blobs.bat: typed keypoints
# (dark blob / bright blob / saddle) on the synthetic blobs image.
source "$(dirname "$0")/_common.sh"
img=$(fetch blobs.png)
hess -i "$img" -v 2 --dump-intermediates "$WORK/views"
echo "typed-keypoint view: $WORK/views/blobs/keypoints.png"
