#!/bin/bash
# Reference demos/demo_sunflowers.bat: -t 0.02 -topk 10 — global top-K
# selection keeps the 10 strongest distinct keypoints.
source "$(dirname "$0")/_common.sh"
img=$(fetch sunflowers.png)
hess -i "$img" -t 0.02 -topk 10 -v 2
