"""Operator library — Ray-Data re-expressions of the reference's transforms.

Organization:
- ``rowwise``   — stateless vectorized ``map_batches`` ops (SURVEY.md §2.2)
- ``keyed``     — per-key ordered ops via ONE hash-partition shuffle
                  (SURVEY.md §2.4: the Window.partitionBy(id) family)
- ``summarize`` — conditional group-collapse (SURVEY.md §2.5)
- ``lookup``    — broadcast small-side joins (SURVEY.md §2.6/2.7)
- ``ml``        — stateful actor-pool stages: HMM Viterbi (SURVEY.md §2.6)
- ``sketch``    — mergeable sketches (HyperLogLog count-distinct)
"""
