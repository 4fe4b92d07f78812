#!/bin/bash
# Reference demos/demo2.bat: TestWinGlut -il list640.txt — batch over an
# image list (the five 640x480 test images).
source "$(dirname "$0")/_common.sh"
fetch 640-1.jpg 640-2.jpg 640-3.jpg 640-4.jpg 640-5.jpg > /dev/null
ls "$WORK" | grep '\.jpg$' > "$WORK/list640.txt"
hess -il "$WORK/list640.txt" -v 1
