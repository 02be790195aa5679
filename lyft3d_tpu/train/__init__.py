"""Training harness: losses, optimizers, schedules, checkpointing, trainer.

One harness replaces the reference's three trainer stacks (script-loop UNet/
DeepLab, step-loop SECOND, Trainer-class PointRCNN) and the four duplicated
fastai optimizer copies (SURVEY.md §2.7).
"""
