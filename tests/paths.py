import os

POTENTIALS = os.path.join(os.path.dirname(__file__), "potentials")


def pot(name):
    return os.path.join(POTENTIALS, name)
