from . import basic, dsp, mha, rnn, windows  # noqa: F401
