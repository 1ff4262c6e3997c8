"""Job-control shim for the Spark rebuild of miw — the analog of the
reference's third entry point (python/miw_job.py + miwlogger.py),
which template-builds a miw CLI command and launches it via
subprocess.

The API is drop-in: ``MIWJob(launcher, miw_command).run(options)``
where ``miw_command`` is a template whose ``$keys`` are replaced by
``options`` values (same multi_replace semantics as upstream,
including its documented beware-if-a-key-is-also-a-value caveat) and
``launcher`` is whatever starts the engine — for the Spark build
that's a ``spark-submit --class graft.miw.MiwCli <assembly-jar>``
line instead of the reference's ``<miw_loc>/miw`` binary. Every flag
the template expands to is understood by graft.miw.MiwCli
(-fnames/-ofname/-format_name/-output_format/-merge_results/...;
tuning flags like -autosplit/-memory_factor are accepted no-ops —
Spark owns splitting and memory).

Example (the reference's own default template, unchanged):

    from miw_job import MIWJob
    job = MIWJob(
        "spark-submit --class graft.miw.MiwCli target/graft.jar")
    job.run({
        "$fnames": "/data/proxy-2015-03-02.log",
        "$ofname": "/out/proxy-2015-03-02.csv",
        "$format_files_repo": "/root/reference/miw/formats",
        "$logfile": "proxy_format",
        "$memfactor": "1.0",
    })

For local development without an assembly jar:

    MIWJob('sbt "runMain graft.miw.MiwCli', suffix='"')
"""
import logging
import shlex
from subprocess import call

formatter = logging.Formatter(
    "[%(levelname)s@%(asctime)s][%(filename)s:%(lineno)s - %(funcName)2s() ] %(message)s")
stdout_handler = logging.StreamHandler()
stdout_handler.setFormatter(formatter)
logger = logging.getLogger(__name__)
logger.setLevel(logging.DEBUG)
logger.addHandler(stdout_handler)

DEFAULT_COMMAND = ('-fnames $fnames -ofname $ofname '
                   '-format_name $format_files_repo/$logfile '
                   '-output_format csv -autosplit -merge_results '
                   '-memory_factor $memfactor')


# beware if a key is also a value (reference python/miw_job.py:6-9)
def multi_replace(text, word_dict):
    for key in word_dict:
        text = text.replace(key, word_dict[key])
    return text


class MIWJob:
    """Runs one or more miw jobs through the Spark CLI."""

    def __init__(self, launcher, miw_command='', suffix='', shell=False):
        self.launcher = launcher
        self.suffix = suffix
        self.miw_command = miw_command if miw_command else DEFAULT_COMMAND
        # SECURITY: by default the expanded command is shlex-split and
        # run WITHOUT a shell, so template-expanded option values can't
        # inject pipes/redirects/; into a shell line (the reference shim
        # runs shell=True unconditionally — python/miw_job.py). Pass
        # shell=True only for launcher strings that genuinely need shell
        # features, and then only with TRUSTED options.
        self.shell = shell

    def build_command(self, miw_options):
        local_command = multi_replace(self.miw_command, miw_options)
        return self.launcher + ' ' + local_command + self.suffix

    def run(self, miw_options):
        cmd = self.build_command(miw_options)
        logger.debug("MIW job command=%s" % cmd)
        call_output = call(cmd if self.shell else shlex.split(cmd),
                           shell=self.shell)
        if call_output == 0:
            logger.debug('Successfully MIW job %s' % cmd)
        else:
            logger.error('Failed MIW job call %s' % cmd)
        return call_output


def _selftest():
    job = MIWJob("spark-submit --class graft.miw.MiwCli graft.jar")
    cmd = job.build_command({
        "$fnames": "/data/a.log,/data/b.log",
        "$ofname": "/out/r.csv",
        "$format_files_repo": "/fmt",
        "$logfile": "proxy_format",
        "$memfactor": "1.0",
    })
    expected = ("spark-submit --class graft.miw.MiwCli graft.jar "
                "-fnames /data/a.log,/data/b.log -ofname /out/r.csv "
                "-format_name /fmt/proxy_format -output_format csv "
                "-autosplit -merge_results -memory_factor 1.0")
    assert cmd == expected, cmd
    # custom template + sbt launcher form (keys must not be prefixes of
    # one another — the reference's own "beware if a key is also a
    # value" replace-loop caveat, preserved verbatim)
    dev = MIWJob('sbt "runMain graft.miw.MiwCli',
                 '-fnames $file -format_name $fmt -output_format mem',
                 suffix='"')
    assert dev.build_command({"$file": "x.log", "$fmt": "f.json"}) == \
        'sbt "runMain graft.miw.MiwCli -fnames x.log -format_name f.json ' \
        '-output_format mem"'
    # the quoted runMain argument survives shlex as ONE argv token
    assert shlex.split(dev.build_command(
        {"$file": "x.log", "$fmt": "f.json"}))[1].startswith("runMain ")
    # shell=False default: an option value with shell metacharacters is
    # passed as argv data, never interpreted by a shell
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        marker = os.path.join(td, "pwned")
        rc = MIWJob("true", "-ofname $o").run({"$o": "x; touch " + marker})
        assert rc == 0 and not os.path.exists(marker), "shell injection!"
    print("miw_job selftest OK")


if __name__ == "__main__":
    import sys
    if "--selftest" in sys.argv:
        _selftest()
    else:
        print(__doc__)
