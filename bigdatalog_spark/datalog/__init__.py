"""Datalog front end: parser, semantics, compiler, fixpoint."""
