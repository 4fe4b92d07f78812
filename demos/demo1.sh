#!/bin/bash
# Reference demos/demo1.bat: TestWinGlut -i 1600.jpg — large-image
# detection; headless here, so dump the 7 viewer views as PNGs.
source "$(dirname "$0")/_common.sh"
img=$(fetch 1600.jpg)
hess -i "$img" -v 1 --dump-intermediates "$WORK/views"
echo "views in $WORK/views"
