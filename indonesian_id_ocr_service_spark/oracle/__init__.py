"""Pure-Python single-document oracle (reference semantics, no Spark).

Used only by the test suite: the Spark pipeline's outputs are compared
against these functions on small corpora. Nothing in here runs on
executors or at scale.
"""
