from .linop import MatrixOperator, FunctionOperator, LinearOperator, aslinearoperator
