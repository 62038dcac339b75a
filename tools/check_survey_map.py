#!/usr/bin/env python3
"""Invariant: every query id registered in SparkEntry.queries appears in
SURVEY.md's coverage map — either literally (qNNN) or inside a range
written as qA-qB / qA–qB (en dash)."""
import re, glob, sys

qs = set()
for f in glob.glob('src/main/scala/graft/entry/*.scala') + ['src/main/scala/graft/SparkEntry.scala']:
    qs |= {int(m) for m in re.findall(r'"q(\d+)_[a-z0-9_]*"', open(f).read())}
survey = open('SURVEY.md').read()
covered = {int(m) for m in re.findall(r'\bq(\d+)\b', survey)}
for a, b in re.findall(r'\bq(\d+)[-–]q?(\d+)\b', survey):
    covered |= set(range(int(a), int(b) + 1))
missing = sorted(q for q in qs if q not in covered)
print(f"registered: {len(qs)}  missing from SURVEY: {[f'q{m:02d}' for m in missing]}")
sys.exit(1 if missing else 0)
