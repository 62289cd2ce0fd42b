"""Loss functions and the multi-task/multi-dataset criterion machinery."""
