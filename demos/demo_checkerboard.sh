#!/bin/bash
# Reference demos/demo_checkerboard.bat: -t 0.000001 — saddle points at
# checkerboard crossings (the Hessian personality's headline feature).
source "$(dirname "$0")/_common.sh"
img=$(fetch checkerboard.png)
hess -i "$img" -t 0.000001 -v 2 --dump-intermediates "$WORK/views"
