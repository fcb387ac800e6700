"""As-of reconstruction over the delta log (the reference's
``checkout_timestamp`` + worktree read, ``/root/reference/src/git.rs:151-189``
and ``src/graphs.rs:96-111``)."""
