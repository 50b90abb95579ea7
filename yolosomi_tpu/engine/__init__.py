"""Training engine (L5/L6): optimizer, EMA, train step, runner.

TPU-native counterparts of the reference's training services
(train.py:125-283, utils/torch_utils.py:292-349).
"""
