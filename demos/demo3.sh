#!/bin/bash
# Reference demos/demo3.bat: TestWinGlut -il listx.txt — one list with
# varying image sizes (exercises the shape-bucketed jit cache).
source "$(dirname "$0")/_common.sh"
fetch 640-1.jpg 800-1.jpg 1600.jpg > /dev/null
printf '640-1.jpg\n800-1.jpg\n1600.jpg\n' > "$WORK/listx.txt"
hess -il "$WORK/listx.txt" -v 1
