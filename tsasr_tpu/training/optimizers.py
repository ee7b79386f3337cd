"""Optimizer factories (optax-based).

The reference instantiates torch optimizers from YAML via ``!name:``
partials (``opt_class: !name:torch.optim.AdamW``, yaml:292-297). Here the
same YAML slot holds a factory returning an optax transform given a
learning rate (scalar or schedule fn); the Brain composes it with global
norm clipping and gradient accumulation inside one jitted update.
"""

import optax


def make_adamw(lr=1e-3, betas=(0.9, 0.98), eps=1e-8, weight_decay=0.01):
    """AdamW factory matching the recipe's optimizer block."""

    def factory(learning_rate=None):
        return optax.adamw(
            learning_rate if learning_rate is not None else lr,
            b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay)

    factory.base_lr = lr
    return factory


def make_adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8):
    def factory(learning_rate=None):
        return optax.adam(learning_rate if learning_rate is not None
                          else lr, b1=betas[0], b2=betas[1], eps=eps)

    factory.base_lr = lr
    return factory


def make_sgd(lr=1e-2, momentum=0.0, weight_decay=0.0):
    def factory(learning_rate=None):
        tx = optax.sgd(learning_rate if learning_rate is not None else lr,
                       momentum=momentum)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx

    factory.base_lr = lr
    return factory
