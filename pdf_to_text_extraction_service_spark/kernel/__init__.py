"""Pure-Python extraction kernels — no Spark imports allowed here.

Every module reproduces the cited reference algorithm byte-for-byte on
the construct subset the corpus generator emits (see SURVEY.md §7 "hard
parts" for the documented subset boundaries).
"""
