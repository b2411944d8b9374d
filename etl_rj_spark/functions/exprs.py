"""Expression combinators shared by the column kernels.

``bind_once`` exists because Spark's higher-order functions re-evaluate
every NON-lambda-variable subtree of a lambda body once per element:
``transform(sequence(1, size(toks)), i -> slice(toks, i, n))`` computes
the whole ``toks`` expression (normalize + split, or worse) once per
output element, and codegen subexpression elimination cannot rescue it
— each HOF occurrence binds fresh NamedLambdaVariable expr-ids, so the
occurrences are never structurally equal (guide §1.2; measured 16× on
token n-grams at sf0.1). Binding the expensive subtree to a lambda
variable makes every reference a variable read.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` exactly once and let ``body`` reference it any
    number of times (including inside nested lambdas) for free.

    Implemented as ``transform(array(value), v -> body(v))[1]`` — the
    single-element transform is the expression-level `let`: the array
    wrapper evaluates ``value`` once, the lambda variable ``v`` is a
    cheap slot read everywhere ``body`` uses it, and ``element_at(_, 1)``
    unwraps the result. Values are bit-identical to inlining ``value``
    (a NULL ``value`` reaches ``body`` as NULL, exactly as the inlined
    expression would evaluate to NULL in the same positions).
    """
    return F.element_at(F.transform(F.array(value), body), 1)
