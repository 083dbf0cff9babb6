"""The four reference CLIs as an installable package (console scripts
pixelpick-{al,train,eval,query}); the repo-root shims keep the reference's
`python main_al.py ...` invocation working from a checkout."""
