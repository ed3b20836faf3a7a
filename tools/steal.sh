#!/bin/bash
# prints avg stolen cores (x100, integer) over $1 seconds (default 30)
dur=${1:-30}
s1=$(awk '/^cpu /{print $9}' /proc/stat); sleep $dur
s2=$(awk '/^cpu /{print $9}' /proc/stat)
awk -v a=$s1 -v b=$s2 -v d=$dur 'BEGIN{printf "%.2f\n", (b-a)/100/d}'
